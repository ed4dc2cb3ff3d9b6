"""Gap-based sessionization over event streams.

The reference's daily-grain rollups (SURVEY.md §2.10 T4,
`worker_processar_trafego.php:36`) quantize time into fixed calendar
buckets; sessionization is the data-dependent generalization a clickstream
/ training-telemetry pipeline needs: a new session starts whenever a user
is idle longer than ``gap``.

Scale shape: ONE shuffle on the user key. Both window passes (the lag that
flags session starts and the running sum that numbers sessions) and the
final per-session aggregation all share the same hash partitioning, so
Catalyst plans a single Exchange followed by in-partition sorts — no
second shuffle, no Python. Timestamps are plain numeric columns (int64
nanos for the events table), so the same arithmetic runs unchanged on any
engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap: int,
    tiebreak_cols: Sequence[str] = (),
    session_col: str = "session_index",
) -> DataFrame:
    """Assign a per-user session index (1-based) to every row.

    A row starts a new session when it is the user's first row or when
    ``ts - previous_ts > gap`` (same unit as ``ts_col``). ``tiebreak_cols``
    make the intra-user order total when timestamps can collide.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_start = F.when(
        prev_ts.isNull() | ((F.col(ts_col) - prev_ts) > F.lit(gap)), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__is_start", is_start).withColumn(
        session_col, F.sum("__is_start").over(running).cast("long")
    ).drop("__is_start")


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap: int,
    value_col: str | None = None,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Sessionize then aggregate one row per (user, session): event count,
    start/end timestamps, duration, and (optionally) the rounded sum of
    ``value_col``. The aggregation reuses the sessionize shuffle."""
    sess = sessionize(
        df, user_col, ts_col, gap=gap, tiebreak_cols=tiebreak_cols
    )
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("total_value"))
    return sess.groupBy(user_col, "session_index").agg(*aggs)
