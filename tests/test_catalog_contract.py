"""Catalog-contract guards: the driver-facing surface stays consistent.

These are pure-Python checks (no Spark jobs): every oracle pairs with a
registered query, the driver-priority window is intact, and names stay
unique — a registration typo fails here instead of surfacing as a missing
CORRECTNESS row a round later.
"""

from __future__ import annotations

from pipeline_etl_ecommerce_spark import testdata_queries as tq


def test_every_oracle_has_a_query():
    qs, oracles = tq.queries(), tq.oracle_sql()
    assert set(oracles) <= set(qs)


def test_every_query_is_oracle_paired():
    # since r6 even the sketch profile has a (tolerance-banded) oracle:
    # no catalog row may ship without a value-hash check.
    qs, oracles = tq.queries(), tq.oracle_sql()
    assert set(qs) - set(oracles) == set()


def test_driver_priority_names_all_registered():
    missing = [n for n in tq._DRIVER_PRIORITY if n not in tq.QUERIES]
    assert missing == []


def test_driver_order_starts_with_priority_window():
    order = list(tq.queries())
    pri = [n for n in tq._DRIVER_PRIORITY if n in tq.QUERIES]
    assert order[: len(pri)] == pri
    # everything registered but unprioritized still reaches the catalog
    assert set(order) == set(tq.QUERIES)


def test_oracle_sql_mentions_only_known_tables():
    # cheap sanity: oracle FROM/JOIN targets are testdata views or CTEs
    import re

    from pipeline_etl_ecommerce_spark.schemas import TESTDATA_TABLES

    known = set(TESTDATA_TABLES)
    for name, sql in tq.oracle_sql().items():
        ctes = set(
            re.findall(
                r"(\w+)\s*(?:\([\w, ]*\))?\s+AS\s*(?:MATERIALIZED\s*)?\(", sql, re.IGNORECASE
            )
        )
        # negative lookbehind: "x IS DISTINCT FROM y" is a predicate, not a scan
        targets = set(
            re.findall(r"(?:(?<!DISTINCT )FROM|JOIN)\s+([a-z_][a-z0-9_]*)", sql, re.IGNORECASE)
        )
        unknown = {
            t.lower()
            for t in targets
            if t.lower() not in known
            and t not in ctes
            and t.lower() not in {c.lower() for c in ctes}
            and t.lower() not in {"unnest", "generate_series", "read_parquet"}
        }
        assert not unknown, f"{name}: unknown FROM targets {unknown}"


def test_oracle_output_types_are_spark_mappable():
    """CORRECTNESS_r04's only red row was DuckDB widening a windowed
    SUM(BIGINT)-BIGINT to HUGEINT — values identical, typed hash diverged.
    Gate the whole class: DESCRIBE every oracle against sf0.001 and reject
    any column typed outside the set that maps 1:1 onto a Spark type
    (HUGEINT, DECIMAL leaks, TIMESTAMP WITH TIME ZONE, unsigned ints all
    fail here instead of as a driver hash mismatch a round later)."""
    import os

    import duckdb
    import pytest as _pytest

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        _pytest.skip("sf0.001 testdata not present")

    from pipeline_etl_ecommerce_spark.schemas import TESTDATA_TABLES

    allowed = {
        "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
        "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN",
    }
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    bad = {}
    for name, sql in tq.oracle_sql().items():
        rows = con.execute(f"DESCRIBE ({sql})").fetchall()
        offending = [(r[0], r[1]) for r in rows if r[1] not in allowed]
        if offending:
            bad[name] = offending
    assert not bad, f"oracles with un-mappable output types: {bad}"


def test_coverage_doc_references_real_queries():
    # doc-rot guard: every query name COVERAGE.md cites in its driver-query
    # column must exist in the registered catalog
    import os
    import re as _re

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")) as fh:
        text = fh.read()
    cited = set()
    for line in text.splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 2 or cells[-1] in {"driver query", "---"}:
            continue
        for tok in _re.findall(r"[a-z][a-z0-9_]{4,}", cells[-1]):
            cited.add(tok)
    known = set(tq.queries())
    # only enforce tokens that LOOK like query names (snake_case with _)
    candidates = {t for t in cited if "_" in t and not t.startswith(("tests", "test_", "e2e"))}
    # words that appear in prose annotations, not names
    prose = {t for t in candidates if t not in known}
    unknown = sorted(
        t for t in prose
        if any(t.startswith(p) for p in ("flagship", "pricing", "daily", "sink_", "streaming_",
                                          "near_dup", "minhash", "simhash", "bpe_", "dsir_",
                                          "pq_", "zorder", "json_", "csv_", "lateral",
                                          "events_", "backfill", "not_in", "part_sales"))
    )
    assert not unknown, f"COVERAGE.md cites unknown queries: {unknown}"
