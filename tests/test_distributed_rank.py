"""distributed_global_rank / distributed_ntile vs the built-in global
window: the distributed construction must reproduce ``row_number()`` /
``NTILE(k)`` over the same unique total order bit-for-bit, at every
cardinality class the closed form branches on (n < k, n = k, n % k == 0,
n % k != 0, n = 1), for any partition count (more partitions than rows,
one partition, default), and the result must not depend on the input
layout (shuffled/repartitioned input).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pipeline_etl_ecommerce_spark.operators.ranking import (
    distributed_global_rank,
    distributed_ntile,
)


def _make(spark, n, seed_shift=0):
    # Unique (val, id) order key; val deliberately collides so the id
    # tiebreak is load-bearing.
    rows = [((i * 7 + seed_shift) % 13, i) for i in range(n)]
    return spark.createDataFrame(rows, "val int, id int")


def _expected_ntile(spark, df, k):
    w = Window.orderBy("val", "id")
    return {
        (r["val"], r["id"]): r["t"]
        for r in df.withColumn("t", F.ntile(k).over(w).cast("long")).collect()
    }


@pytest.mark.parametrize("n", [1, 3, 10, 20, 23, 97])
@pytest.mark.parametrize("parts", [1, 4, 32])
def test_ntile_matches_builtin(spark, n, parts):
    df = _make(spark, n)
    expected = _expected_ntile(spark, df, 10)
    got = {
        (r["val"], r["id"]): r["t"]
        for r in distributed_ntile(
            df, 10, ["val", "id"], tile_col="t", num_partitions=parts
        ).collect()
    }
    assert got == expected


def test_ntile_rejects_nonpositive_k(spark):
    """r10 (ADVICE r9): k=0 reached `% 0` in the tile expression — silent
    NULL tiles in non-ANSI mode. Argument errors must be loud."""
    df = _make(spark, 5)
    for bad in (0, -3):
        with pytest.raises(ValueError, match="n_tiles"):
            distributed_ntile(df, bad, ["val", "id"], tile_col="t")


@pytest.mark.parametrize("n", [1, 10, 97])
def test_global_rank_matches_row_number(spark, n):
    df = _make(spark, n)
    w = Window.orderBy("val", "id")
    expected = {
        (r["val"], r["id"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w).cast("long")).collect()
    }
    got = {
        (r["val"], r["id"]): r["rk"]
        for r in distributed_global_rank(df, ["val", "id"], rank_col="rk").collect()
    }
    assert got == expected


def test_rank_is_layout_independent(spark):
    a = _make(spark, 50)
    b = _make(spark, 50).repartition(7, "id")
    ra = {
        (r["val"], r["id"]): r["rk"]
        for r in distributed_global_rank(a, ["val", "id"], rank_col="rk").collect()
    }
    rb = {
        (r["val"], r["id"]): r["rk"]
        for r in distributed_global_rank(b, ["val", "id"], rank_col="rk").collect()
    }
    assert ra == rb
    assert sorted(ra.values()) == list(range(1, 51))


def test_total_col_rides_broadcast(spark):
    df = _make(spark, 17)
    out = distributed_global_rank(df, ["val", "id"], rank_col="rk", total_col="n")
    rows = out.collect()
    assert {r["n"] for r in rows} == {17}
    assert sorted(r["rk"] for r in rows) == list(range(1, 18))


def test_no_unpartitioned_window_over_input(spark):
    """The plan's only Window nodes sit above the bounded per-partition
    stats aggregate, never directly over the input table: every Window's
    subtree must contain the stats HashAggregate."""
    df = _make(spark, 100)
    plan = (
        distributed_ntile(df, 10, ["val", "id"], tile_col="t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window [" not in line:
            continue
        subtree = "\n".join(lines[i : i + 8])
        assert "__dgr_cnt" in subtree or "count(1)" in subtree, (
            "Window node not over the bounded stats table:\n" + subtree
        )
