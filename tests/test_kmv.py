"""KMV sketches: mergeability (the mart property), exact regime below k,
estimator accuracy, and input validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark.operators.kmv import (
    kmv_estimate,
    kmv_pair_estimates,
    kmv_sketch,
)


def _sketch_list(spark, values, k):
    df = spark.createDataFrame([(v,) for v in values], "v long").withColumn(
        "g", F.lit("x")
    )
    return kmv_sketch(df, ["g"], "v", k=k).collect()[0]["kmv"]


def test_sketch_is_mergeable(spark):
    # sketch(A ∪ B) == k-smallest of (sketch(A) ∪ sketch(B)) — the property
    # that makes per-day sketch COLUMNS a valid mart (merge without facts)
    a_vals = list(range(0, 400))
    b_vals = list(range(300, 700))
    k = 32
    sa = _sketch_list(spark, a_vals, k)
    sb = _sketch_list(spark, b_vals, k)
    direct = _sketch_list(spark, sorted(set(a_vals) | set(b_vals)), k)
    merged = sorted(set(sa) | set(sb))[:k]
    assert merged == direct


def test_exact_regime_below_k(spark):
    # fewer than k distinct values -> the sketch IS the distinct hash set
    # and the estimate is the exact count
    df = spark.createDataFrame([(i % 10,) for i in range(100)], "v long").withColumn(
        "g", F.lit("x")
    )
    out = (
        kmv_sketch(df, ["g"], "v", k=64)
        .select(F.size("kmv").alias("n"), kmv_estimate(F.col("kmv"), k=64).alias("est"))
        .collect()[0]
    )
    assert out["n"] == 10 and out["est"] == 10.0


def test_pair_estimates_exact_when_union_small(spark):
    sa = _sketch_list(spark, range(0, 20), 64)
    sb = _sketch_list(spark, range(10, 30), 64)
    df = spark.createDataFrame([(sa, sb)], "a array<bigint>, b array<bigint>")
    got = df.select(kmv_pair_estimates(F.col("a"), F.col("b"), k=64).alias("s")).collect()[0]["s"]
    assert got["est_union"] == 30.0
    assert got["est_intersection"] == 10.0


def test_estimate_accuracy_at_k(spark):
    # 5000 distinct values, k=256: estimate within the 3-sigma band
    # (~19%; typical ~6%) — deterministic, so this never flakes
    est = (
        spark.createDataFrame([(v,) for v in range(5000)], "v long")
        .withColumn("g", F.lit("x"))
        .transform(lambda d: kmv_sketch(d, ["g"], "v", k=256))
        .select(kmv_estimate(F.col("kmv"), k=256).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est - 5000) / 5000 < 0.19, est


def test_nulls_dropped_and_k_validated(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "v long").withColumn(
        "g", F.lit("x")
    )
    assert kmv_sketch(df, ["g"], "v", k=8).collect()[0]["kmv"].__len__() == 2
    with pytest.raises(ValueError):
        kmv_sketch(df, ["g"], "v", k=1)


def test_estimate_k_is_required():
    # a build/estimate k mismatch must fail loudly at call time, not return
    # element_at(kmv, default_k) silently (ADVICE r6)
    with pytest.raises(TypeError):
        kmv_estimate(F.col("kmv"))  # type: ignore[call-arg]
    with pytest.raises(TypeError):
        kmv_pair_estimates(F.col("a"), F.col("b"))  # type: ignore[call-arg]
