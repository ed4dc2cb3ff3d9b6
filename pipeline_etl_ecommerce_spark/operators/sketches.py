"""Mergeable sketch marts — the incremental-distinct design for 100 TB.

``approx_count_distinct`` answers one query in one pass; a SKETCH MART
persists the per-partition (e.g. per-day) HyperLogLog state itself, so
any later union of days — last 7, last 90, one campaign — is a merge of
tiny binary blobs instead of a rescan of the fact. Spark 3.5+ ships the
Apache DataSketches HLL surface natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``), all JVM-side.

The key property (tested): merging per-day sketches estimates the
union within the sketch's error envelope — the same few-percent band as
sketching the union directly (DataSketches' union path can route
registers through a different mode, so the two estimates are close but
not byte-identical). The mart answers any date-range distinct question
at sketch accuracy while each ingest only sketches its own delta
(O(delta) update, like the signature marts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_hll_mart(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per group: ``(group_cols..., hll binary)``. This is
    the persistable artifact — a few KB per group regardless of group
    size. ``lg_k`` trades accuracy for size (2^lg_k registers)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("hll")
    )


def merge_hll_estimate(
    mart: DataFrame,
    group_cols: Sequence[str],
) -> DataFrame:
    """Roll the sketch mart up to ``group_cols`` (possibly empty for a
    grand total) and estimate the distinct count — a merge of binary
    blobs, never a rescan of the fact. Output: group cols +
    ``approx_distinct``."""
    gl = list(group_cols)
    agg = F.round(F.hll_sketch_estimate(F.hll_union_agg("hll"))).cast("long").alias(
        "approx_distinct"
    )
    if gl:
        return mart.groupBy(*gl).agg(agg)
    return mart.agg(agg)
