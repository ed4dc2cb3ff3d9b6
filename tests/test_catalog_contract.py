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


def test_only_sketch_profile_is_rows_only():
    qs, oracles = tq.queries(), tq.oracle_sql()
    assert set(qs) - set(oracles) == {"sketch_profile_lineitem"}


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
