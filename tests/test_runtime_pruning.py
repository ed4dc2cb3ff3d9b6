"""Plan guards for the two runtime pruning demos (NEW r4): dynamic
partition pruning and the runtime bloom filter must actually appear in the
executed plan under the demo's conditions — and the documented negative
cases (VALUES dim folds its filter away; broadcast join needs no bloom)
must hold, or the docstrings are lying."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark import testdata_queries as tq

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def dpp_mart(spark):
    base = tempfile.mkdtemp(prefix="dpp_test_")
    fact_path = os.path.join(base, "fact")
    dim_path = os.path.join(base, "dim")
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    (
        o.withColumn("month", F.month("o_orderdate").cast("int"))
        .write.partitionBy("month")
        .mode("overwrite")
        .parquet(fact_path)
    )
    spark.sql(
        f"SELECT * FROM VALUES {tq._QMAP_ROWS} AS t(month, q_label)"
    ).write.mode("overwrite").parquet(dim_path)
    yield fact_path, dim_path
    shutil.rmtree(base, ignore_errors=True)


def test_dpp_fires_on_partition_column_join(spark, dpp_mart):
    fact_path, dim_path = dpp_mart
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("q_label") == "Q1")
    plan = _executed_plan(fact.join(dim, "month").groupBy("month").count())
    assert "dynamicpruning" in plan, f"DPP subquery missing:\n{plan}"


def test_dpp_needs_a_file_backed_dim(spark, dpp_mart):
    # the documented trap: a VALUES local relation constant-folds the Q1
    # filter into the relation itself, leaving no selective predicate for
    # the PartitionPruning rule to latch onto
    fact_path, _ = dpp_mart
    fact = spark.read.parquet(fact_path)
    values_dim = spark.sql(
        f"SELECT * FROM VALUES {tq._QMAP_ROWS} AS t(month, q_label)"
    ).filter(F.col("q_label") == "Q1")
    plan = _executed_plan(fact.join(values_dim, "month").groupBy("month").count())
    assert "dynamicpruning" not in plan


def test_dpp_result_matches_direct_filter(spark, dpp_mart):
    fact_path, dim_path = dpp_mart
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("q_label") == "Q1")
    pruned = {
        (r["month"], r["count"])
        for r in fact.join(dim, "month").groupBy("month").count().collect()
    }
    direct = {
        (r["month"], r["count"])
        for r in fact.filter(F.col("month").isin(1, 2, 3)).groupBy("month").count().collect()
    }
    assert pruned == direct and len(pruned) == 3


def _bloom_frames(spark):
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_partkey", "l_extendedprice"
    )
    p = (
        spark.read.parquet(os.path.join(SF_DIR, "part.parquet"))
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey", "p_type")
    )
    return li, p


def test_bloom_filter_fires_on_shuffle_join(spark):
    li, p = _bloom_frames(spark)
    j = li.join(p, li.l_partkey == p.p_partkey).groupBy("p_type").count()
    with tq._conf_pin(spark, tq._BLOOM_CONFS):
        plan = _executed_plan(j)
    assert "bloom_filter_agg" in plan and "might_contain" in plan, plan
    # the filter must sit on the FACT scan side, before the join shuffle
    fact_scan = [ln for ln in plan.splitlines() if "might_contain" in ln]
    assert any("l_partkey" in ln for ln in fact_scan)


def test_bloom_filter_skipped_for_broadcast_join(spark):
    # negative case from the docstring: a broadcast join ships the whole dim
    # anyway, so Spark injects no bloom filter
    li, p = _bloom_frames(spark)
    confs = dict(tq._BLOOM_CONFS, **{"spark.sql.autoBroadcastJoinThreshold": "10MB"})
    j = li.join(p, li.l_partkey == p.p_partkey).groupBy("p_type").count()
    with tq._conf_pin(spark, confs):
        plan = _executed_plan(j)
    assert "BroadcastHashJoin" in plan and "might_contain" not in plan


def test_bloom_filter_result_identical_with_and_without(spark):
    li, p = _bloom_frames(spark)

    def build():
        return li.join(p, li.l_partkey == p.p_partkey).groupBy("p_type").count()

    with tq._conf_pin(spark, tq._BLOOM_CONFS):
        with_bloom = {(r["p_type"], r["count"]) for r in build().collect()}
    off = dict(tq._BLOOM_CONFS, **{"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"})
    with tq._conf_pin(spark, off):
        without = {(r["p_type"], r["count"]) for r in build().collect()}
    assert with_bloom == without and with_bloom
