"""AQE skew-join demo guards (r3-verdict item 5): prove that under the pinned
confs the runtime actually SPLITS the hot partition (the `skew=true` marker in
the executed SortMergeJoin), and that the result is identical with the
optimization on or off — i.e. AQE handles at runtime what `salted_join` does
by hand, and the manual shape is only needed for the cases its docstring
keeps."""

from __future__ import annotations

import pytest

from pipeline_etl_ecommerce_spark import testdata_queries as tq

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    # AQE finalizes the plan only after THIS QueryExecution runs — collect()
    # drives df's own QE (a count() would execute a different one)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def skew_frames(spark):
    return tq._aqe_skew_frames(spark, SF_DIR)


def test_skew_split_fires_in_executed_plan(spark, skew_frames):
    fact, dim = skew_frames
    joined = fact.join(dim, "skew_key")
    with tq._conf_pin(spark, tq._AQE_SKEW_CONFS):
        plan = _executed_plan(joined)
    assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan}"


def test_skew_split_not_needed_without_force(spark, skew_frames):
    # sanity on the docstring claim: grouping on the join key downstream
    # makes AQE skip the split unless forced — that's WHY the demo pins
    # forceOptimizeSkewedJoin and why salting still exists for aggregations.
    # sum(qty) (not count) so column pruning doesn't shrink the fact shuffle
    # below the skew threshold; grouping exactly on the join key so the join
    # output partitioning satisfies the aggregation and AQE must choose
    # between preserving it and splitting the skew.
    fact, dim = skew_frames

    def build():
        # a DataFrame caches its QueryExecution after the first run — AQE
        # finalizes once, so each conf setting needs a FRESH plan
        return fact.join(dim, "skew_key").groupBy("skew_key").agg({"qty": "sum"})

    confs = dict(tq._AQE_SKEW_CONFS)
    confs["spark.sql.adaptive.forceOptimizeSkewedJoin"] = "false"
    with tq._conf_pin(spark, confs):
        unforced = _executed_plan(build())
    confs["spark.sql.adaptive.forceOptimizeSkewedJoin"] = "true"
    with tq._conf_pin(spark, confs):
        forced = _executed_plan(build())
    assert "skew=true" not in unforced
    assert "skew=true" in forced


def test_result_identical_with_and_without_skew_split(spark, skew_frames):
    fact, dim = skew_frames

    def build():
        # fresh plan per conf (QueryExecution is cached per DataFrame)
        return (
            fact.join(dim, "skew_key")
            .groupBy("seg_label")
            .agg({"qty": "sum", "*": "count"})
            .withColumnRenamed("sum(qty)", "sum_qty")
            .withColumnRenamed("count(1)", "n_lines")
        )

    with tq._conf_pin(spark, tq._AQE_SKEW_CONFS):
        with_split = {r["seg_label"]: (r["n_lines"], r["sum_qty"]) for r in build().collect()}
    off = dict(tq._AQE_SKEW_CONFS, **{"spark.sql.adaptive.skewJoin.enabled": "false"})
    with tq._conf_pin(spark, off):
        without = {r["seg_label"]: (r["n_lines"], r["sum_qty"]) for r in build().collect()}
    assert with_split == without
    assert with_split["seg_HOT"][0] > sum(v[0] for k, v in with_split.items() if k != "seg_HOT")


def test_conf_pin_restores_and_unsets(spark):
    probe = "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    before = spark.conf.get(probe)
    with tq._conf_pin(spark, {probe: "7"}):
        assert spark.conf.get(probe) == "7"
    assert spark.conf.get(probe) == before
