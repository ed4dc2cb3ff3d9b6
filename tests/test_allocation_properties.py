"""Property-based tests (hypothesis) for the allocation operator family —
the invariants that must hold for ANY input, not just golden fixtures:

- conservation: un-rounded, un-capped allocations sum to the parent metric
  within each parent that has positive weight;
- cap dominance: capped allocations never exceed the child's cap;
- fallback exclusivity: in zero-weight parents only the main child receives
  anything, and it receives exactly the parent metric.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pipeline_etl_ecommerce_spark.operators.allocation import AllocSpec, allocate_ratio_to_parent

weights = st.lists(st.floats(min_value=0.0, max_value=1e6, allow_nan=False), min_size=1, max_size=6)
metric = st.floats(min_value=0.0, max_value=1e6, allow_nan=False)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ws=weights, m=metric)
def test_conservation_and_cap(spark_prop, ws, m):
    spark = spark_prop
    rows = [("P", f"C{i}", float(w), float(m), float(w) / 2.0) for i, w in enumerate(ws)]
    # main child id == parent id for the fallback branch
    rows[0] = ("P", "P", rows[0][2], rows[0][3], rows[0][4])
    df = spark.createDataFrame(rows, "parent string, child string, w double, m double, cap double")
    out = allocate_ratio_to_parent(
        df,
        parent_key="parent",
        weight="w",
        specs=[AllocSpec("m", "alloc"), AllocSpec("m", "alloc_capped", cap="cap")],
        child_id="child",
        parent_id="parent",
    ).collect()

    total_w = sum(ws)
    allocs = {r["child"]: r for r in out}
    if total_w > 0:
        # conservation: allocations sum to the parent metric
        assert math.isclose(sum(r["alloc"] for r in out), m, rel_tol=1e-9, abs_tol=1e-6)
        # cap dominance
        for r in out:
            assert r["alloc_capped"] <= r["cap"] + 1e-9
    else:
        # fallback: main child takes 100%, siblings take 0
        assert allocs["P"]["alloc"] == pytest.approx(m)
        for r in out:
            if r["child"] != "P":
                assert r["alloc"] == 0.0


@pytest.fixture(scope="module")
def spark_prop(spark):
    return spark
