"""Property-based tests (hypothesis) for the corpus-assembly operators —
invariants that must hold for ANY input:

- chunking conservation: non-overlapping chunks concatenate back to the
  exact token stream, in order, with no chunk exceeding chunk_size;
- stride coverage: every token position is covered by >= 1 chunk;
- mixture monotonicity: raising the budget only ADDS rows (thresholds are
  monotone in the keep-rate), and keep-rates never exceed 1.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pipeline_etl_ecommerce_spark.operators.chunking import chunk_documents
from pipeline_etl_ecommerce_spark.operators.sampling import temperature_mixture_sample

token = st.text(alphabet="abcxyz", min_size=1, max_size=4)
texts = st.lists(
    st.lists(token, min_size=1, max_size=40).map(" ".join), min_size=1, max_size=8
)


@pytest.fixture(scope="module")
def spark_prop(spark):
    return spark


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ts=texts, size=st.integers(min_value=1, max_value=9))
def test_chunking_conserves_tokens(spark_prop, ts, size):
    df = spark_prop.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", chunk_size=size).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(ts):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_index"])
        assert all(r["chunk_tokens"] <= size for r in chunks)
        assert " ".join(r["chunk_text"] for r in chunks) == t  # exact reassembly
        # starts advance by exactly chunk_size (the stride default)
        assert [r["chunk_start"] for r in chunks] == [k * size for k in range(len(chunks))]


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    ns=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=4),
    b1=st.integers(min_value=1, max_value=50),
    extra=st.integers(min_value=1, max_value=100),
)
def test_mixture_budget_monotone(spark_prop, ns, b1, extra):
    rows = []
    doc = 0
    for s, n in enumerate(ns):
        for _ in range(n):
            rows.append((doc, f"s{s}"))
            doc += 1
    df = spark_prop.createDataFrame(rows, "doc_id long, lang string")
    small = temperature_mixture_sample(df, "lang", "doc_id", alpha=0.5, budget=b1)
    big = temperature_mixture_sample(df, "lang", "doc_id", alpha=0.5, budget=b1 + extra)
    ids_small = {r["doc_id"] for r in small.collect()}
    ids_big = {r["doc_id"] for r in big.collect()}
    assert ids_small <= ids_big  # larger budget only adds rows
    assert all(r["keep_rate"] <= 1.0 for r in big.select("keep_rate").distinct().collect())
