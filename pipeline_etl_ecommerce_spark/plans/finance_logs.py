"""Finance mart imports: Tiny payables/receivables logs.

Spark restatement of reference ``tarefa_importar_log_despesas_semanal.php``
and ``tarefa_importar_log_recebiveis.php`` (SURVEY.md §2.1 S9, §2.8 F3):
7-day lookback windows re-scanned on every run with idempotent keyed upserts
(T3 late-data convergence); 'd/m/Y' date strings parsed to dates; defaults
('Sem Categoria', historico→descricao fallback).

Note: the reference maps the receivable's ``vencimento`` (due date) into
``data_recebimento`` (reference line 85) — replicated deliberately, flagged
in SURVEY §7.0.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _window_filter(parsed_date, start: dt.date | str, end: dt.date | str):
    return (parsed_date >= F.lit(str(start)).cast("date")) & (parsed_date <= F.lit(str(end)).cast("date"))


def import_despesas(contas: DataFrame, start: dt.date | str, end: dt.date | str) -> DataFrame:
    """contas: payable-detail payloads (id long, vencimento 'dd/MM/yyyy'
    string, valor double-or-string, categoria, historico, descricao,
    cliente struct(nome)). Output: ``schemas.LOG_DESPESAS_ERP`` rows."""
    venc = F.to_date(F.col("vencimento"), "dd/MM/yyyy")
    return (
        contas.withColumn("data_vencimento", venc)
        .filter(_window_filter(F.col("data_vencimento"), start, end))
        .select(
            F.col("id").cast("long").alias("id_lancamento_tiny"),
            "data_vencimento",
            F.col("valor").cast("double").alias("valor"),
            F.coalesce(F.col("categoria"), F.lit("Sem Categoria")).alias("categoria_mapeada"),
            F.coalesce(F.col("historico"), F.col("descricao")).alias("historico"),
            F.col("cliente")["nome"].alias("fornecedor"),
        )
        .dropDuplicates(["id_lancamento_tiny"])
    )


def import_recebiveis(contas: DataFrame, start: dt.date | str, end: dt.date | str) -> DataFrame:
    """Same shape as ``import_despesas``; output ``schemas.LOG_RECEBIVEIS_ERP``."""
    venc = F.to_date(F.col("vencimento"), "dd/MM/yyyy")
    return (
        contas.withColumn("data_recebimento", venc)
        .filter(_window_filter(F.col("data_recebimento"), start, end))
        .select(
            F.col("id").cast("long").alias("id_lancamento_tiny"),
            "data_recebimento",
            F.col("valor").cast("double").alias("valor_recebido"),
            F.coalesce(F.col("historico"), F.col("descricao")).alias("historico"),
            F.col("cliente")["nome"].alias("cliente"),
        )
        .dropDuplicates(["id_lancamento_tiny"])
    )
