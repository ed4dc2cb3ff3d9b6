"""Property tests for the round-3 surfaces: the explicit-timezone day
expression against Python's zoneinfo over random instants (DST years
included), pagination exactness over random page geometries, and the
null-safe JDBC merge recipe against a reference last-wins model.
"""

from __future__ import annotations

import datetime as dt
import random
import zoneinfo

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark.sources.jdbc_merge import (
    merge_statements_null_safe,
)
from pipeline_etl_ecommerce_spark.sources.rest import (
    fetch_offset_limit,
    fetch_page_number,
    fetch_scroll,
)
from pipeline_etl_ecommerce_spark.testdata_queries import _tz_day

SP = zoneinfo.ZoneInfo("America/Sao_Paulo")


def test_tz_day_matches_zoneinfo_over_random_instants(spark):
    """5000 random instants across 2015-2025 (Brazil observed DST until
    2019): the Spark expression's calendar day must equal Python
    zoneinfo's, including both transition edges."""
    rng = random.Random(7)
    lo = int(dt.datetime(2015, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    hi = int(dt.datetime(2025, 12, 31, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    us = [rng.randrange(lo, hi) for _ in range(5000)]
    # pin some instants right at historic DST transitions (2018-11-04
    # 03:00 UTC spring-forward, 2019-02-17 02:00 UTC fall-back, ±1 us)
    for edge in ("2018-11-04 03:00:00", "2019-02-17 02:00:00"):
        base = int(
            dt.datetime.fromisoformat(edge).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6
        )
        us += [base - 1, base, base + 1]
    df = spark.createDataFrame([(u,) for u in us], "us bigint")
    got = {
        r["us"]: r["d"]
        for r in df.select("us", _tz_day(F.col("us")).alias("d")).collect()
    }
    for u in us:
        want = dt.datetime.fromtimestamp(u / 1e6, tz=dt.timezone.utc).astimezone(SP).date()
        assert got[u] == want, f"us={u}: spark {got[u]} != zoneinfo {want}"


@given(total=st.integers(0, 200), limit=st.integers(1, 37))
@settings(max_examples=60, deadline=None)
def test_offset_limit_exactly_once(total, limit):
    rows = [{"id": i} for i in range(total)]

    def fetch(offset, lim):
        return {"results": rows[offset : offset + lim], "paging": {"total": total}}

    seen = [r["id"] for p in fetch_offset_limit(fetch, limit=limit) for r in p]
    assert seen == list(range(total))


@given(total=st.integers(0, 200), page=st.integers(1, 37))
@settings(max_examples=60, deadline=None)
def test_scroll_exactly_once(total, page):
    rows = [{"id": i} for i in range(total)]

    def fetch(scroll_id):
        lo = 0 if scroll_id is None else int(scroll_id)
        return {"results": rows[lo : lo + page], "scroll_id": str(lo + page)}

    seen = [r["id"] for p in fetch_scroll(fetch) for r in p]
    assert seen == list(range(total))


@given(total=st.integers(0, 200), page=st.integers(1, 37))
@settings(max_examples=60, deadline=None)
def test_page_number_exactly_once(total, page):
    rows = [{"id": i} for i in range(total)]

    def fetch(n):
        lo = (n - 1) * page
        return rows[lo : lo + page]

    seen = [r["id"] for p in fetch_page_number(fetch) for r in p]
    assert seen == list(range(total))


_key = st.tuples(st.one_of(st.none(), st.integers(0, 3)), st.one_of(st.none(), st.sampled_from("ab")))
_row = st.tuples(_key, st.integers(-100, 100))


@given(old=st.lists(_row, max_size=12, unique_by=lambda r: r[0]), new=st.lists(_row, max_size=12, unique_by=lambda r: r[0]))
@settings(max_examples=40, deadline=None)
def test_null_safe_recipe_matches_last_wins_model(old, new):
    """DuckDB executing the null-safe DELETE-then-INSERT must land exactly
    the reference model: old rows overwritten by any new row with the same
    (null-safe) key, new keys inserted — for ANY key content incl. NULLs."""
    con = duckdb.connect()
    con.execute("CREATE TABLE target (k1 BIGINT, k2 VARCHAR, val BIGINT)")
    con.execute("CREATE TABLE staging (k1 BIGINT, k2 VARCHAR, val BIGINT)")
    if old:
        con.executemany("INSERT INTO target VALUES (?, ?, ?)", [(k[0], k[1], v) for k, v in old])
    if new:
        con.executemany("INSERT INTO staging VALUES (?, ?, ?)", [(k[0], k[1], v) for k, v in new])
    for stmt in merge_statements_null_safe("duckdb", "target", "staging", ["k1", "k2"], ["k1", "k2", "val"]):
        con.execute(stmt)
    got = sorted(con.execute("SELECT * FROM target").fetchall(), key=str)
    model = {k: v for k, v in old}
    model.update({k: v for k, v in new})
    want = sorted([(k[0], k[1], v) for k, v in model.items()], key=str)
    assert got == want
    con.close()
