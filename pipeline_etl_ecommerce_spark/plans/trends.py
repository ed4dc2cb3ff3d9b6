"""Market-trends ingestion: trends payloads → ``tendencias_mercado``.

Spark restatement of reference ``tarefa_coletar_tendencias.php:30-35``
(SURVEY.md §2.5 W5, §2.9 E4): list index as 1-based rank via posexplode.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capture_trends(trends: DataFrame, data_verificacao: dt.date | str) -> DataFrame:
    """trends: (id_categoria string, keywords array<string> in API order)."""
    return trends.select(
        F.lit(str(data_verificacao)).cast("date").alias("data_verificacao"),
        "id_categoria",
        F.posexplode("keywords").alias("pos", "palavra_chave"),
    ).select(
        "data_verificacao",
        "id_categoria",
        "palavra_chave",
        (F.col("pos") + 1).cast("int").alias("posicao_tendencia"),
    )
