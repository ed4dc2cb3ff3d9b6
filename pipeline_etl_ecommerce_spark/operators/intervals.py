"""Interval analytics: sweep-line peak concurrency over half-open intervals.

"How many orders/sessions/jobs were open at once, and when did the peak
start?" is the classic interval-overlap question. The reference has no
interval operator (its joins are equi-joins, SURVEY.md §2.3); this is part
of the event-analytics extension surface alongside ``operators/asof.py``.

Scale design — the textbook O(n log n) sweep, expressed as window/agg
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

**Parallel prefix scan** (``cell_width``): a plain running sum is one
window task PER GROUP — fine for thousands of groups, a single-task
bottleneck when one group holds billions of boundaries. The decomposition
is the classic two-level scan: split each group's timeline into coarse
FIXED-WIDTH cells (caller-chosen width, same units as the timestamps — a
constant, so no global min/max aggregate and no cross join enters the
plan), run the running sum LOCALLY per (group, cell) — parallelism =
groups × cells — then compute each cell's starting offset with a second
window over the per-cell closing totals (groups × cells rows, broadcast
back) and add it back. Prefix sums are associative, so the result is
identical to the single-window plan; only the task graph changes. Pick a
width giving O(cluster parallelism) cells per group, not O(rows).
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
    *,
    cell_width: int | None = None,
) -> DataFrame:
    """Per group: the maximum number of simultaneously open half-open
    ``[start, end)`` intervals, and the earliest timestamp at which that
    peak is reached. Start/end columns must be integral epochs (exact,
    timezone-free, and bucketable).

    ``cell_width``: optional parallel-scan decomposition — use when a
    single group's boundary count outgrows one window task (see module
    docstring). Results are identical either way."""
    keys = list(group_cols)
    start = F.col(start_col) if isinstance(start_col, str) else start_col
    end = F.col(end_col) if isinstance(end_col, str) else end_col
    deltas = df.select(*keys, start.alias("__ts"), F.lit(1).alias("__d")).unionAll(
        df.select(*keys, end.alias("__ts"), F.lit(-1).alias("__d"))
    )
    per_ts = deltas.groupBy(*keys, "__ts").agg(F.sum("__d").alias("__d"))

    if cell_width is None:
        w_run = (
            Window.partitionBy(*keys)
            .orderBy("__ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        curve = per_ts.withColumn("open_count", F.sum("__d").over(w_run))
    else:
        if cell_width < 1:
            raise ValueError("peak_concurrency: cell_width must be >= 1")
        # level 1: local running sum per (group, fixed-width cell) —
        # groups×cells tasks. A CONSTANT width keeps the plan free of any
        # global min/max aggregate + cross join (a data-derived width
        # duplicated the whole upstream into a second scan branch).
        cells = per_ts.withColumn(
            "__cell", F.floor(F.col("__ts") / F.lit(int(cell_width)))
        )
        w_local = (
            Window.partitionBy(*keys, "__cell")
            .orderBy("__ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = cells.withColumn("__run_local", F.sum("__d").over(w_local))
        # level 2: each cell's starting offset = prefix sum of PRIOR cells'
        # CLOSING totals (the local running sum at the cell's last ts) — a
        # window over groups×cells rows, tiny by construction, broadcast
        # back so the big side keeps its partitioning.
        cell_tot = local.groupBy(*keys, "__cell").agg(
            F.max_by("__run_local", "__ts").alias("__tot")
        )
        w_cells = (
            Window.partitionBy(*keys)
            .orderBy("__cell")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = cell_tot.withColumn(
            "__off", F.coalesce(F.sum("__tot").over(w_cells), F.lit(0))
        ).select(*keys, "__cell", "__off")
        curve = (
            local.join(F.broadcast(offsets), [*keys, "__cell"])
            .withColumn("open_count", F.col("__run_local") + F.col("__off"))
            .drop("__cell", "__run_local", "__off")
        )

    peak = curve.withColumn("peak_open", F.max("open_count").over(Window.partitionBy(*keys)))
    return (
        peak.filter(F.col("open_count") == F.col("peak_open"))
        .groupBy(*keys, "peak_open")
        .agg(F.min("__ts").alias("peak_start"))
    )
