"""Multi-level aggregation: ROLLUP / CUBE grouping sets and pivot.

The reference computes its two-level rollup by hand — a per-variation
aggregation re-aggregated to the parent listing (SURVEY.md §2.4 A3,
`tarefa_consolidar_dados.php:118-138`). These helpers generalize that to
SQL-standard grouping sets, which Spark evaluates in a single pass with
the Expand operator (one shuffle total, partial aggregation map-side)
instead of one job per level.

``grouping_id`` uses the SQL-standard bit encoding (bit i set = dim i is
aggregated away), identical across Spark and DuckDB, so results are
engine-portable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_agg(
    df: DataFrame, dims: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Hierarchical subtotals: (d1..dn), (d1..dn-1), …, () — n+1 levels,
    one shuffle. Aggregated-away dims come back NULL; ``gid`` tells a real
    NULL group value from a subtotal row."""
    return df.rollup(*dims).agg(
        *aggs, F.grouping_id().cast("long").alias("gid")
    )


def cube_agg(
    df: DataFrame, dims: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """All 2^n dim subsets in one pass (Expand ×2^n then a single
    hash-aggregate)."""
    return df.cube(*dims).agg(*aggs, F.grouping_id().cast("long").alias("gid"))


def pivot_agg(
    df: DataFrame,
    row_dims: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
    *,
    out_prefix: str = "",
) -> DataFrame:
    """groupBy(row_dims).pivot(pivot_col, values) with an EXPLICIT value
    list — never the value-discovery overload, which adds a distinct scan
    job and makes the output schema data-dependent (a 100 TB anti-pattern;
    schemas must be static for downstream marts). Output columns are
    ``{out_prefix}{value}``."""
    out = (
        df.groupBy(*row_dims)
        .pivot(pivot_col, list(pivot_values))
        .agg(agg)
    )
    for v in pivot_values:
        out = out.withColumnRenamed(str(v), f"{out_prefix}{v}")
    return out
