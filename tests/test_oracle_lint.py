"""The oracle ROUND binary-tie lint: zero unadjudicated sites in the live
catalog, no stale adjudications, and the seeded counterexamples below MUST
be caught (the two advisor-found bug shapes)."""

from __future__ import annotations

from pipeline_etl_ecommerce_spark.oracle_lint import (
    ROUND_TIE_ALLOWLIST,
    round_sites,
    round_tie_findings,
    stale_allowlist_entries,
)
from pipeline_etl_ecommerce_spark.testdata_queries import ORACLE


def test_catalog_is_clean():
    assert round_tie_findings(ORACLE) == []


def test_no_stale_allowlist_entries():
    assert stale_allowlist_entries(ORACLE) == []


def test_seeded_counterexamples_are_caught():
    # the event_type_transitions r6 bug shape: rounded count-ratio
    bad1 = {
        "seeded": "SELECT ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 6) AS p FROM t GROUP BY k"
    }
    # the try_divide r5 bug shape: plain integer-column quotient
    bad2 = {"seeded": "SELECT ROUND(returns / orders, 4) AS rate FROM t"}
    assert len(round_tie_findings(bad1)) == 1
    assert len(round_tie_findings(bad2)) == 1


def test_structural_tokens_pass_without_allowlist():
    ok = {
        "a": "SELECT ROUND(x / sqrt(y), 6) FROM t",
        "b": "SELECT ROUND(ln(a) / b, 6) FROM t",
        "c": "SELECT ROUND(CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / n, 9) FROM t",
        "d": "SELECT ROUND(x * 100, 0) FROM t",  # no division at all
    }
    assert round_tie_findings(ok) == []


def test_round_site_extraction_handles_nesting():
    sql = "SELECT ROUND(ROUND(a / b, 8) / c, 2) FROM t"
    sites = round_sites(sql)
    assert len(sites) == 2  # outer and inner both extracted
    assert len(round_tie_findings({"q": sql})) == 2


def test_allowlist_reasons_are_written():
    for k, reason in ROUND_TIE_ALLOWLIST.items():
        assert reason.startswith(("monitored:", "structural:")), k
        assert len(reason) > 30, k


def test_round_site_extraction_skips_quoted_parens():
    """A string literal containing an unbalanced paren must not derail the
    paren walk (advice r7): the site still extracts completely and the
    division inside is still flagged."""
    sql = "SELECT ROUND(length(regexp_replace(x, '(', 'y')) / n, 4) FROM t"
    sites = round_sites(sql)
    assert len(sites) == 1
    assert sites[0].endswith("/ n, 4)")
    assert len(round_tie_findings({"q": sql})) == 1
    # escaped quote inside a literal ('' = one quote) also survives
    sql2 = "SELECT ROUND(length(replace(x, '''(', ')')) / n, 4) FROM t"
    assert len(round_sites(sql2)) == 1
    # a closing paren inside a literal must not terminate the site early
    sql3 = "SELECT ROUND(coalesce(nullif(x, ')'), 0) / n, 4) FROM t"
    (site3,) = round_sites(sql3)
    assert site3.endswith("/ n, 4)")
