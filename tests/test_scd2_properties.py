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
