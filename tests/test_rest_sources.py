"""S4-S6 REST pagination dialects: each fetch loop must visit every row
exactly once, terminate on its dialect's stop condition, and round-trip
through the JSONL landing zone into a typed DataFrame.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pipeline_etl_ecommerce_spark.sources.rest import (
    fetch_offset_limit,
    fetch_page_number,
    fetch_scroll,
    ingest_pages,
    land_pages,
)

ROWS = [{"id": i, "name": f"r{i}"} for i in range(23)]
SCHEMA = StructType([StructField("id", LongType()), StructField("name", StringType())])


def _offset_fetch(calls=None):
    def fetch(offset, limit):
        if calls is not None:
            calls.append(offset)
        return {"results": ROWS[offset : offset + limit], "paging": {"total": len(ROWS)}}

    return fetch


def test_offset_limit_visits_all_rows_once():
    calls = []
    pages = list(fetch_offset_limit(_offset_fetch(calls), limit=5))
    assert [r["id"] for p in pages for r in p] == list(range(23))
    assert calls == [0, 5, 10, 15, 20]  # no extra call past total


def test_offset_limit_exact_multiple_no_trailing_call():
    rows = ROWS[:20]

    def fetch(offset, limit):
        return {"results": rows[offset : offset + limit], "paging": {"total": 20}}

    pages = list(fetch_offset_limit(fetch, limit=5))
    assert sum(len(p) for p in pages) == 20 and len(pages) == 4


def test_offset_limit_parallel_preserves_order():
    pages = list(fetch_offset_limit(_offset_fetch(), limit=4, max_workers=4))
    assert [r["id"] for p in pages for r in p] == list(range(23))


def test_offset_limit_rejects_bad_limit():
    with pytest.raises(ValueError):
        list(fetch_offset_limit(_offset_fetch(), limit=0))


def test_scroll_terminates_on_empty_page():
    chunks = {None: (ROWS[:10], "s1"), "s1": (ROWS[10:20], "s2"), "s2": (ROWS[20:], "s3"), "s3": ([], None)}

    def fetch(scroll_id):
        results, nxt = chunks[scroll_id]
        return {"results": results, "scroll_id": nxt}

    pages = list(fetch_scroll(fetch))
    assert [r["id"] for p in pages for r in p] == list(range(23))


def test_scroll_terminates_on_missing_scroll_id():
    def fetch(scroll_id):
        return {"results": ROWS[:5]} if scroll_id is None else pytest.fail("called again")

    pages = list(fetch_scroll(fetch))
    assert len(pages) == 1 and len(pages[0]) == 5


def test_page_number_stops_at_first_empty_page():
    def fetch(page):
        lo = (page - 1) * 10
        return ROWS[lo : lo + 10]

    pages = list(fetch_page_number(fetch))
    assert [len(p) for p in pages] == [10, 10, 3]


def test_empty_source_yields_typed_empty_frame(spark, tmp_path):
    df = ingest_pages(spark, iter([]), SCHEMA, str(tmp_path / "drop"))
    assert df.count() == 0 and df.schema == SCHEMA


def test_landing_roundtrip(spark, tmp_path):
    drop = str(tmp_path / "drop")
    paths = land_pages(fetch_offset_limit(_offset_fetch(), limit=7), drop)
    assert len(paths) == 4
    df = spark.read.schema(SCHEMA).json(drop + "/*.json")
    got = sorted((r["id"], r["name"]) for r in df.collect())
    assert got == [(r["id"], r["name"]) for r in ROWS]


def test_reused_drop_dir_does_not_union_stale_pages(spark, tmp_path):
    """Run 1 lands 5 pages; run 2 into the SAME dir lands 3 (the API
    shrank). ingest_pages must return run 2's rows only — the two stale
    run-1 files still on disk are not silently unioned in."""
    drop = str(tmp_path / "drop")
    land_pages(fetch_offset_limit(_offset_fetch(), limit=5), drop)  # 5 files

    short = ROWS[:12]

    def fetch2(offset, limit):
        return {"results": short[offset : offset + limit], "paging": {"total": len(short)}}

    df = ingest_pages(spark, fetch_offset_limit(fetch2, limit=5), SCHEMA, drop)
    assert sorted(r["id"] for r in df.collect()) == list(range(12))
