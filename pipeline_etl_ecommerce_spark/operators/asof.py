"""As-of (point-in-time) join and keyed time-range join.

Neither exists in the reference (its joins are all equi-joins,
SURVEY.md §2.3), but both are core operators for event pipelines:
"most recent X at or before T" (attribution, slowly-changing lookups)
and "all X within [T+lo, T+hi)" (windowed feature counts).

Scale design — no sort-merge-inequality fallback, no cartesian:

- ``asof_join`` uses the union trick: tag both sides, union, and run ONE
  window per key ordered by (ts, side, tiebreak) taking the last non-null
  right-side payload. Cost = one shuffle of |L|+|R| rows; never expands
  rows, skew-bounded by the largest single key. This is the plan you want
  at 100 TB — a naive ``l.ts >= r.ts`` join is O(|L|·|R|) per key.
- ``range_join`` buckets time into ``ceil(window / bucket)`` coarse cells:
  the right side keeps its cell, the left side explodes to the few cells
  its window overlaps, the join is a plain EQUI-join on (key, cell) that
  Catalyst shuffles/broadcasts normally, and the exact range predicate
  refines. Row expansion is bounded by windows-per-bucket, not by key
  cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    payload_cols: Sequence[str],
    right_tiebreak: str,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Inclusive as-of left join. ``direction='backward'`` (default): for
    every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` for the same keys (among right rows tied on ts,
    the one with the greatest ``right_tiebreak`` wins — a total order keeps
    the result deterministic). ``direction='forward'``: the right row with
    the SMALLEST ``right_ts >= left_ts`` (ties: smallest tiebreak wins).
    Left rows with no match keep NULL payloads. Payload columns appear as
    ``{prefix}{col}``. Either direction is the same one-shuffle union+window
    plan; only the frame and tie ordering flip.

    ``tolerance`` (same units as the ts columns) is the feature-store
    max-staleness contract: a match further than ``tolerance`` from the
    probe is discarded (NULL payloads), so a point-in-time lookup never
    serves arbitrarily stale state. Applied AFTER the window pass — a
    map-side filter, no plan change."""
    if direction not in ("backward", "forward"):
        raise ValueError("asof_join: direction must be 'backward' or 'forward'")
    if tolerance is not None and tolerance < 0:
        raise ValueError("asof_join: tolerance must be >= 0")
    keys = list(key_cols)
    # the match's own ts rides inside the struct so staleness is computable
    payload = F.struct(
        F.col(right_ts).alias("__mts"), *[F.col(c) for c in payload_cols]
    ).alias("__payload")
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.col(right_tiebreak).alias("__tie"),
        payload,
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        # Right rows sort before left rows at equal ts (backward-INCLUSIVE)
        # and ascending __tie puts the winning tied right row nearest the
        # probe; last() over the preceding frame reads it.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts"), F.col("__is_right").desc(), F.col("__tie"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = unioned.withColumn(
            "__match", F.last("__payload", ignorenulls=True).over(w)
        )
    else:
        # Forward = backward over the MIRRORED ordering: descending ts puts
        # every right row with rts >= lts before the probe (right rows first
        # at equal ts = forward-INCLUSIVE; descending __tie makes the
        # smallest tied tiebreak the last seen, i.e. the winner), and
        # last() over the preceding frame reads the nearest one. Expressed
        # this way BOTH directions use the incremental Running frame —
        # a (currentRow, unboundedFollowing) frame with first() computes
        # the same result but Spark evaluates that frame shape
        # non-incrementally (re-scans per row; 10x-scale stress showed
        # 5.7x wall where the mirrored form tracks the backward leg).
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").desc(), F.col("__is_right").desc(), F.col("__tie").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = unioned.withColumn(
            "__match", F.last("__payload", ignorenulls=True).over(w)
        )
    out = matched.filter(F.col("__is_right") == 0)
    if tolerance is not None:
        staleness = (
            F.col("__ts") - F.col("__match.__mts")
            if direction == "backward"
            else F.col("__match.__mts") - F.col("__ts")
        )
        out = out.withColumn(
            "__match", F.when(staleness <= F.lit(tolerance), F.col("__match"))
        )
    for c in payload_cols:
        out = out.withColumn(prefix + c, F.col("__match." + c))
    return out.drop("__ts", "__is_right", "__tie", "__payload", "__match")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    lo: int,
    hi: int,
    bucket: int,
) -> DataFrame:
    """Keyed time-range inner join: pairs (l, r) sharing ``key_cols`` with
    ``l.left_ts + lo <= r.right_ts < l.left_ts + hi``. ``bucket`` is the
    coarse cell width (same unit as the timestamps); choose it near
    ``hi - lo`` so each left row explodes to ~2 cells."""
    if hi <= lo:
        raise ValueError("range_join needs lo < hi")
    keys = list(key_cols)
    r = right.withColumn("__cell", F.floor(F.col(right_ts) / F.lit(bucket)))
    cells = F.sequence(
        F.floor((F.col(left_ts) + F.lit(lo)) / F.lit(bucket)),
        F.floor((F.col(left_ts) + F.lit(hi) - 1) / F.lit(bucket)),
    )
    l = left.withColumn("__cell", F.explode(cells))
    joined = l.join(r, [*keys, "__cell"]).filter(
        (F.col(right_ts) >= F.col(left_ts) + F.lit(lo))
        & (F.col(right_ts) < F.col(left_ts) + F.lit(hi))
    )
    return joined.drop("__cell")
