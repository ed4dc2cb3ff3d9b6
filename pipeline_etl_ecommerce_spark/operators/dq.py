"""Data-quality constraint checks (dbt-test / Deequ-style).

The reference trusts MySQL constraints and silently skips bad rows inline
(SURVEY.md §2.2 P4's NULL guards); a warehouse-grade engine surfaces those
as declarative checks with violation counts, run as plain aggregations over
the same scans the pipelines use. Each check returns one (rule, violations)
row; ``dq_report`` unions them into the report a daily run would publish.

Scale shape: every check is a single aggregation — not-null and
accepted-values are map-side counts folded into one scan; uniqueness is one
groupBy on the key (map-side partial agg); referential integrity is one
left-anti join (broadcast when the parent's key side is dim-sized). Nothing
is quadratic, and every check's output is exactly one row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one_row(df: DataFrame, rule: str, violations) -> DataFrame:
    return df.select(
        F.lit(rule).alias("rule"), violations.cast("long").alias("violations")
    )


def check_not_null(df: DataFrame, cols: Sequence[str], *, table: str) -> DataFrame:
    """Count rows where ANY of ``cols`` is NULL (one scan, map-side sum)."""
    cond = None
    for c in cols:
        p = F.col(c).isNull()
        cond = p if cond is None else cond | p
    agg = df.agg(F.sum(F.when(cond, 1).otherwise(0)).alias("v"))
    return _one_row(agg, f"not_null:{table}({','.join(cols)})", F.coalesce(F.col("v"), F.lit(0)))


def check_unique(df: DataFrame, key_cols: Sequence[str], *, table: str) -> DataFrame:
    """Count rows beyond the first per key (0 = key is unique)."""
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .agg(F.sum(F.col("n") - 1).alias("v"))
    )
    return _one_row(dup, f"unique:{table}({','.join(key_cols)})", F.coalesce(F.col("v"), F.lit(0)))


def check_accepted_values(
    df: DataFrame, col: str, values: Sequence[str], *, table: str
) -> DataFrame:
    """Count non-NULL rows whose ``col`` is outside ``values``."""
    bad = ~F.col(col).isin(list(values)) & F.col(col).isNotNull()
    agg = df.agg(F.sum(F.when(bad, 1).otherwise(0)).alias("v"))
    vals = ",".join(sorted(values))
    return _one_row(agg, f"accepted_values:{table}.{col}[{vals}]", F.coalesce(F.col("v"), F.lit(0)))


def check_referential(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    *,
    child_table: str,
    parent_table: str,
) -> DataFrame:
    """Count child rows whose non-NULL ``fk`` has no match in the parent's
    ``pk`` (left-anti join; the distinct parent key side broadcasts when
    dim-sized)."""
    orphans = (
        child.filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti")
        .agg(F.count("*").alias("v"))
    )
    return _one_row(
        orphans,
        f"referential:{child_table}.{fk}->{parent_table}.{pk}",
        F.coalesce(F.col("v"), F.lit(0)),
    )


def dq_report(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the one-row check results into the publishable report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
