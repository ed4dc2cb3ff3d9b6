"""Property-based guarantees for the SCD2 interval build and burst dedup:
whatever the log looks like, the history must partition each key's
timeline and conserve its events, and the debounce must keep exactly the
rows a sequential scan would keep."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pipeline_etl_ecommerce_spark.operators.scd import scd2_from_log
from pipeline_etl_ecommerce_spark.operators.sessions import dedupe_bursts

logs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # key
        st.integers(min_value=0, max_value=40),         # ts
        st.sampled_from(["a", "b", None]),              # attr
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=logs)
def test_scd2_partitions_timeline_and_conserves_events(spark, rows):
    data = [(k, t, i, a) for i, (k, t, a) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, ts long, eid long, attr string")
    hist = scd2_from_log(df, ["k"], "attr", "ts", tiebreak_cols=["eid"]).collect()

    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.k, []).append(r)
    for k, runs in by_key.items():
        runs.sort(key=lambda r: (r.valid_from, r.first_event))
        # events conserve: run sizes sum to the key's log size
        assert sum(r.n_events for r in runs) == sum(1 for kk, *_ in data if kk == k)
        # exactly one current run, and it is the last
        assert [r.is_current for r in runs] == [False] * (len(runs) - 1) + [True]
        # intervals chain: each valid_to equals the next valid_from
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to == b.valid_from
        assert runs[-1].valid_to is None
        # consecutive runs (in event order) always change attribute; with
        # same-instant changes an empty [x, x) interval is legal — the run
        # was superseded within its starting instant
        for a, b in zip(runs, runs[1:]):
            assert a.attr_value != b.attr_value


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=logs)
def test_debounce_matches_sequential_reference(spark, rows):
    GAP = 5
    data = [(k, t, i) for i, (k, t, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, ts long, eid long")
    kept = {r.eid for r in dedupe_bursts(df, ["k"], "ts", gap=GAP, tiebreak_cols=["eid"]).collect()}

    # sequential reference: sort per key by (ts, eid); keep iff gap to the
    # PREVIOUS ROW (kept or not) exceeds GAP
    expect = set()
    by_key: dict[int, list] = {}
    for k, t, i in data:
        by_key.setdefault(k, []).append((t, i))
    for k, evs in by_key.items():
        evs.sort()
        prev_t = None
        for t, i in evs:
            if prev_t is None or t - prev_t > GAP:
                expect.add(i)
            prev_t = t
    assert kept == expect


# ---------------------------------------------------------------------------
# Invariants for other batch-15+ ops
# ---------------------------------------------------------------------------

texts = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=10),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=texts)
def test_boilerplate_identity_when_threshold_never_hit(spark, rows):
    from pipeline_etl_ecommerce_spark.operators.textstats import (
        remove_boilerplate_segments,
    )

    data = [(i, " ".join(toks)) for i, toks in rows]
    df = spark.createDataFrame(data, "doc_id long, text string")
    # max_docs larger than the corpus: nothing can be boilerplate, so the
    # rebuild must reproduce the (token-normalized) text and drop nothing
    out = {r.doc_id: r for r in remove_boilerplate_segments(
        df, "text", "doc_id", seg_tokens=3, max_docs=10_000
    ).collect()}
    for i, toks in rows:
        if not toks:
            assert i not in out  # token-less docs drop on both engines
        else:
            assert out[i].n_dropped == 0
            assert out[i].clean_text == " ".join(toks)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=logs)
def test_funnel_counts_are_monotone_nonincreasing(spark, rows):
    from pipeline_etl_ecommerce_spark.operators.sessions import funnel_counts

    data = [(k, t, i, a if a is not None else "z") for i, (k, t, a) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, ts long, eid long, et string")
    out = {r.step_index: r.n_sessions for r in funnel_counts(
        df, "k", "ts", "et", ["a", "b", "z"], gap=5, tiebreak_cols=["eid"]
    ).collect()}
    assert out[1] >= out[2] >= out[3] >= 0
