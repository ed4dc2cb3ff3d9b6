"""Search-rank monitoring: keyword targets → ``posicionamento_anuncios``.

Spark restatement of reference ``tarefa_coletar_posicionamento.php:64-93``
(SURVEY.md §2.5 W4): positions are 1-based indexes into the paginated search
results (posicao = offset + index + 1, pagina = page), capped at 500 results;
targets not found keep NULL posicao/pagina (the left join preserves them).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ranking import rank_capture

SCAN_CAP = 500  # 10 pages × 50 (reference line 65)
PAGE_SIZE = 50


def capture_positions(
    targets: DataFrame, search_results: DataFrame, data_verificacao: dt.date | str
) -> DataFrame:
    """targets: (palavra_chave, id_anuncio_pai).
    search_results: (palavra_chave, ordem, id_resultado) — the flattened,
    0-based-ordered public search results per keyword (the posexplode of the
    paginated API responses).
    """
    ranked = rank_capture(
        search_results,
        order_by=["ordem"],
        partition_by="palavra_chave",
        rank_col="posicao",
        page_size=PAGE_SIZE,
        limit=SCAN_CAP,
    )
    hits = (
        ranked.select(
            F.col("palavra_chave").alias("h_kw"),
            F.col("id_resultado").alias("h_id"),
            "posicao",
            "pagina",
        )
        # first occurrence wins (reference breaks on first match)
        .groupBy("h_kw", "h_id")
        .agg(F.min("posicao").alias("posicao"), F.min("pagina").alias("pagina"))
    )
    return (
        targets.join(
            F.broadcast(hits),
            (F.col("palavra_chave") == F.col("h_kw")) & (F.col("id_anuncio_pai") == F.col("h_id")),
            "left",
        )
        .select(
            F.lit(str(data_verificacao)).cast("date").alias("data_verificacao"),
            "palavra_chave",
            "id_anuncio_pai",
            F.col("posicao").cast("int").alias("posicao"),
            F.col("pagina").cast("int").alias("pagina"),
        )
    )
