"""Unit tests for the allocation operator family (SURVEY.md §2.5 W1-W3, W6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark.operators.allocation import (
    AllocSpec,
    allocate_by_share,
    allocate_ratio_to_parent,
)


def test_ratio_allocation_with_cap_and_round(spark):
    rows = [
        # parent, child, weight, parent_metric, own_total
        ("P1", "C1", 300.0, 20.0, 3),
        ("P1", "C2", 100.0, 20.0, 10),
    ]
    df = spark.createDataFrame(rows, "parent string, child string, w double, m double, own int")
    out = allocate_ratio_to_parent(
        df,
        parent_key="parent",
        weight="w",
        specs=[
            AllocSpec("m", "alloc_plain"),
            AllocSpec("m", "alloc_round", round_to=0),
            AllocSpec("m", "alloc_capped", round_to=0, cap="own"),
        ],
    )
    got = {r["child"]: r for r in out.collect()}
    assert got["C1"]["alloc_plain"] == pytest.approx(15.0)
    assert got["C2"]["alloc_plain"] == pytest.approx(5.0)
    assert got["C1"]["alloc_round"] == 15.0
    # cap: min(15, 3) = 3 for C1; min(5, 10) = 5 for C2
    assert got["C1"]["alloc_capped"] == 3.0
    assert got["C2"]["alloc_capped"] == 5.0


def test_zero_weight_fallback_to_main_child(spark):
    rows = [
        ("P1", "P1", 0.0, 40.0),  # main child (id == parent id)
        ("P1", "C2", 0.0, 40.0),
    ]
    df = spark.createDataFrame(rows, "parent string, child string, w double, m double")
    out = allocate_ratio_to_parent(
        df,
        parent_key="parent",
        weight="w",
        specs=[AllocSpec("m", "alloc")],
        child_id="child",
        parent_id="parent",
    )
    got = {r["child"]: r["alloc"] for r in out.collect()}
    assert got["P1"] == 40.0  # main variation takes 100%
    assert got["C2"] == 0.0


def test_half_away_from_zero_rounding(spark):
    # PHP round(0.5) == 1; Spark F.round must match (not banker's rounding).
    rows = [("P1", "C1", 1.0, 1.0), ("P1", "C2", 1.0, 1.0)]
    df = spark.createDataFrame(rows, "parent string, child string, w double, m double")
    out = allocate_ratio_to_parent(
        df, parent_key="parent", weight="w", specs=[AllocSpec("m", "alloc", round_to=0)]
    )
    for r in out.collect():
        assert r["alloc"] == 1.0  # 1.0 * 0.5 = 0.5 -> rounds away from zero


def test_freight_rateio_per_order(spark):
    # reference tarefa_coletar_financas.php:134-135
    rows = [
        (1, "A", 60.0, 30.0),
        (1, "B", 40.0, 30.0),
        (2, "C", 0.0, 10.0),  # zero-revenue order -> freight 0
    ]
    df = spark.createDataFrame(rows, "order long, item string, revenue double, freight double")
    out = allocate_by_share(df, group_key="order", amount="freight", share="revenue", out="frete")
    got = {r["item"]: r["frete"] for r in out.collect()}
    assert got["A"] == pytest.approx(18.0)
    assert got["B"] == pytest.approx(12.0)
    assert got["C"] == 0.0


def test_allocation_stays_jvm_side(spark):
    # Guard: the whole operator must compile to native expressions (no
    # BatchEvalPython / python UDF in the plan).
    rows = [("P1", "C1", 1.0, 1.0)]
    df = spark.createDataFrame(rows, "parent string, child string, w double, m double")
    out = allocate_ratio_to_parent(
        df, parent_key="parent", weight="w", specs=[AllocSpec("m", "alloc", round_to=0, cap="w")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
