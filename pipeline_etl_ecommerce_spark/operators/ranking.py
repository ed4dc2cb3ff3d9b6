"""Ranking / top-k / first-match operators (SURVEY.md §2.5 W4-W5, W7; §2.6).

The reference's versions are imperative: linear scans of paginated API results
with ``posicao = offset + index + 1`` (reference
``tarefa_coletar_posicionamento.php:64-93``), list-index-as-rank (reference
``tarefa_coletar_tendencias.php:30-35``), and loop-``break`` first-match
(reference ``worker_processar_estoque.php:158``). Spark-first: ``row_number``
windows and ``posexplode``.

Scale: a global ``row_number`` over one unpartitioned window is a single-task
sort — fine for the reference's 500-row search pages, wrong at 100 TB. All
helpers here take a partition key; ``rank_capture`` documents the
single-partition case as bounded by its ``limit``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cols(key: str | list[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def first_per_group(df: DataFrame, keys: str | list[str], order_by: list[Column | str]) -> DataFrame:
    """W7: deterministic first row per group (reference's loop-``break``
    first-fulfillment-listing-per-SKU, ``worker_processar_estoque.php:158``)."""
    return top_k_per_group(df, keys, order_by, 1)


def top_k_per_group(
    df: DataFrame, keys: str | list[str], order_by: list[Column | str], k: int, *, rank_col: str | None = None
) -> DataFrame:
    """Top-k rows per group via row_number window; one shuffle on the group key."""
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*_cols(keys)).orderBy(*order_exprs)
    ranked = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col:
        return ranked.withColumnRenamed("__rn", rank_col)
    return ranked.drop("__rn")


def rank_capture(
    df: DataFrame,
    *,
    order_by: list[Column | str],
    partition_by: str | list[str] | None = None,
    rank_col: str = "posicao",
    page_size: int | None = None,
    page_col: str = "pagina",
    limit: int | None = None,
) -> DataFrame:
    """W4: assign 1-based positions in a defined order, with optional page
    number (reference ``posicao = offset + index + 1``, ``pagina = page``) and
    a scan cap (the reference stops after 10 pages × 50 = 500 results).

    With no ``partition_by`` the sort is global (single task after the range
    exchange) — only valid when ``limit`` bounds the result, as in the
    reference's 500-row cap.
    """
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*_cols(partition_by)) if partition_by else Window.partitionBy()
    w = w.orderBy(*order_exprs)
    out = df.withColumn(rank_col, F.row_number().over(w))
    if limit is not None:
        out = out.filter(F.col(rank_col) <= limit)
    if page_size:
        out = out.withColumn(page_col, ((F.col(rank_col) - 1) / F.lit(page_size)).cast("int") + 1)
    return out
