"""Interval analytics: sweep-line peak concurrency over half-open intervals.

"How many orders/sessions/jobs were open at once, and when did the peak
start?" is the classic interval-overlap question. The reference has no
interval operator (its joins are equi-joins, SURVEY.md §2.3); this is part
of the event-analytics extension surface alongside ``operators/asof.py``.

Scale design — the textbook O(n log n) sweep, expressed as three window/agg
passes that all share ONE hash partitioning on the group key:

1. melt each interval into (+1 at start, -1 at end) boundary deltas;
2. collapse deltas per (group, ts) — this both halves the window input and
   makes the running sum DETERMINISTIC (ts is unique per group, so no
   tie-order ambiguity), and it bakes in half-open ``[start, end)``
   semantics: an end and a start at the same instant net to zero, i.e. the
   ending interval never counts as concurrent with the starting one;
3. running sum ordered by ts = concurrency curve; the per-group max and its
   earliest timestamp come from a window max + filter on the same key.

Never expands rows (2 boundary rows per interval), never compares interval
pairs — a naive self-join overlap test is O(n²) per key and unusable at
100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def peak_concurrency(
    df: DataFrame,
    group_cols: Sequence[str],
    start_col: str | Column,
    end_col: str | Column,
) -> DataFrame:
    """Per group: the maximum number of simultaneously open half-open
    ``[start, end)`` intervals, and the earliest timestamp at which that
    peak is reached. Start/end columns must be orderable and identically
    typed (epoch integers recommended — exact, timezone-free)."""
    keys = list(group_cols)
    start = F.col(start_col) if isinstance(start_col, str) else start_col
    end = F.col(end_col) if isinstance(end_col, str) else end_col
    deltas = df.select(*keys, start.alias("__ts"), F.lit(1).alias("__d")).unionAll(
        df.select(*keys, end.alias("__ts"), F.lit(-1).alias("__d"))
    )
    per_ts = deltas.groupBy(*keys, "__ts").agg(F.sum("__d").alias("__d"))
    w_run = (
        Window.partitionBy(*keys)
        .orderBy("__ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = per_ts.withColumn("open_count", F.sum("__d").over(w_run))
    peak = curve.withColumn("peak_open", F.max("open_count").over(Window.partitionBy(*keys)))
    return (
        peak.filter(F.col("open_count") == F.col("peak_open"))
        .groupBy(*keys, "peak_open")
        .agg(F.min("__ts").alias("peak_start"))
    )
