"""Time-series regularization: calendar gap-fill and rolling daily windows.

The reference's daily marts simply lack rows for silent days
(`trafego_diario` has no row when a listing had no traffic —
`worker_processar_trafego.php:36-41`); BI-side that reads as a gap, and
model-side a training pipeline needs dense per-entity daily features.

Scale notes: the spine is built from each entity's OWN [min, max] day
span (``sequence`` + ``explode``) — row expansion is bounded by
span-per-entity, never a global calendar cross-join. The rolling window
sums run in DECIMAL over the pre-aggregated one-row-per-day series, so
frame accumulation is exact and engine-portable; per-entity daily series
share one hash partitioning end-to-end (single shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def daily_gapfill(
    df: DataFrame,
    key_col: str,
    day_col: str,
    *,
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Densify a per-key daily series: one row for EVERY calendar day in
    the key's [min(day), max(day)] span. ``agg_cols`` maps output name →
    aggregate expression evaluated over that day's rows; days with no rows
    get count 0 and NULL aggregates (coalesce downstream as needed).
    Output: key, day, n_rows, *agg_cols."""
    aggs = [F.count("*").alias("n_rows")] + [
        expr.alias(name) for name, expr in (agg_cols or {}).items()
    ]
    daily = df.groupBy(key_col, day_col).agg(*aggs)
    spine = (
        daily.groupBy(key_col)
        .agg(F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.expr("interval 1 day"))
            ).alias(day_col),
        )
    )
    filled = spine.join(daily, [key_col, day_col], "left")
    return filled.withColumn("n_rows", F.coalesce("n_rows", F.lit(0)))


def rolling_daily(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    *,
    window_days: int = 7,
) -> DataFrame:
    """Per-key daily value series with an exact running total and a
    trailing ``window_days`` sum/average. Pre-aggregates to one DECIMAL
    row per (key, day) first, then range-frames over epoch-day numbers so
    calendar gaps are respected without densifying. All frame sums are
    DECIMAL (exact); the average divides two exact numbers once."""
    dayn = F.datediff(F.col(day_col), F.lit("1970-01-01").cast("date"))
    daily = (
        df.groupBy(key_col, day_col)
        .agg(F.sum(F.col(value_col).cast("decimal(38,6)")).alias("__v"))
        .withColumn("__dayn", dayn)
    )
    running = (
        Window.partitionBy(key_col)
        .orderBy("__dayn")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    trailing = (
        Window.partitionBy(key_col)
        .orderBy("__dayn")
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        key_col,
        day_col,
        F.round(F.col("__v").cast("double"), 2).alias("day_value"),
        F.round(F.sum("__v").over(running).cast("double"), 2).alias("running_total"),
        F.round(F.sum("__v").over(trailing).cast("double"), 2).alias("trailing_sum"),
        # cast BEFORE dividing: double-division of two exact values is one
        # deterministic IEEE op; decimal division would introduce
        # engine-specific result-scale rounding. Round at 6dp, not 2: day
        # sums are 2dp and n <= window_days, so no quotient lands exactly
        # on a 7th-decimal half — 2dp rounding hits .005 ties that the two
        # engines break differently.
        F.round(
            F.sum("__v").over(trailing).cast("double") / F.count("*").over(trailing),
            6,
        ).alias("trailing_avg"),
    )
