"""df.observe(): data-quality metrics accumulated on the SAME pass that
produces the result — at 100 TB the difference between free counters and a
second full scan. The reference logs row counts per pipeline step
imperatively; Observation is the Spark-native equivalent."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_observation_metrics_ride_the_result_pass(spark):
    obs = Observation("dq")
    df = spark.range(0, 1000).withColumn("v", (F.col("id") % 10).cast("double"))
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("v").alias("v_sum"),
        F.count(F.when(F.col("v") < 0, 1)).alias("n_negative"),
    )
    grouped = observed.groupBy("v").count()
    assert grouped.count() == 10  # one action; metrics piggyback on it
    m = obs.get
    assert m["n_rows"] == 1000
    assert m["v_sum"] == 4500.0
    assert m["n_negative"] == 0


def test_observation_sees_pre_filter_rows(spark):
    # observe BEFORE a filter counts what the filter discards — the
    # rejected-row counter every ingest step wants without re-scanning
    obs = Observation("ingest")
    df = spark.range(0, 100).withColumn("ok", F.col("id") % 4 != 0)
    kept = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("n_rejected"),
    ).filter(F.col("ok"))
    assert kept.count() == 75
    assert obs.get["n_in"] == 100
    assert obs.get["n_rejected"] == 25
