"""Web-corpus stage: HTML → text extraction, URL canonicalization, and
C4-style line dedup (operators/webtext.py, operators/dedupe.dedup_lines).

The catalog rows prove cross-engine equality of the regex chains; these
tests pin the SEMANTICS to hand-computed expectations — a chain that is
"equal on both engines but wrong" (e.g. script bodies leaking into text,
double entity-unescape, tracking params surviving) fails here, not there.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark.operators import webtext
from pipeline_etl_ecommerce_spark.operators.dedupe import dedup_lines


def _extract_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(webtext.extract_html_text(F.col("h")).alias("t")).collect()[0]["t"]


def _canon_one(spark, url: str) -> str | None:
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(webtext.canonical_url(F.col("u")).alias("c")).collect()[0]["c"]


class TestExtractHtmlText:
    def test_full_document(self, spark):
        html = (
            '<html><head><title>T</title><style>p {c: 1}</style>'
            '<script>if (1<2) { x="</b>"; }</script></head>'
            "<body><h1>Head &amp; er</h1><!-- gone --><p>alpha   beta</p>"
            "<ul><li>one</li><li>two</li></ul>&quot;q&quot; &lt;tag&gt;</body></html>"
        )
        assert _extract_one(spark, html) == 'T\nHead & er\nalpha beta\none\ntwo\n"q" <tag>'

    def test_script_body_never_leaks(self, spark):
        # the classic extraction bug: a generic tag strip leaves "var leak"
        out = _extract_one(spark, "<p>ok</p><script>var leak = 1;</script>")
        assert "leak" not in out
        assert out == "ok"

    def test_no_double_unescape(self, spark):
        # "&amp;lt;" is the ESCAPED text "&lt;", not a "<"
        assert _extract_one(spark, "<p>&amp;lt;</p>") == "&lt;"

    def test_plain_text_passthrough(self, spark):
        assert _extract_one(spark, "no tags here") == "no tags here"

    def test_empty_and_whitespace(self, spark):
        assert _extract_one(spark, "") == ""
        assert _extract_one(spark, "  \n\t ") == ""

    def test_unclosed_script_drops_tail(self, spark):
        # unmatched <script> cannot close; the block regex doesn't fire but
        # the generic strip still removes the tag itself.
        out = _extract_one(spark, "<p>keep</p><script>orphan")
        assert out.startswith("keep")

    def test_oracle_generator_matches_spark(self, spark):
        cases = [
            "<div>a</div>\r\n<div>b</div>",
            "<P>UP</P><BR/><Li x=1>mix</LI>&#39;q&#39;&nbsp;z",
            "angle < loose > brackets <notatag",
        ]
        con = duckdb.connect()
        for h in cases:
            sql = "select " + webtext.html_extract_sql("'" + h.replace("'", "''") + "'")
            assert _extract_one(spark, h) == con.execute(sql).fetchone()[0]


class TestCanonicalUrl:
    @pytest.mark.parametrize(
        "raw,want",
        [
            ("HTTP://EXAMPLE.COM:80/p/1?b=2&utm_source=x&a=1#f", "http://example.com/p/1?a=1&b=2"),
            ("https://Host.com:443/x", "https://host.com/x"),
            ("http://host.com", "http://host.com/"),
            ("http://host.com:8080/x", "http://host.com:8080/x"),  # non-default port kept
            ("http://h.com/p?gclid=1&fbclid=2&ref=3", "http://h.com/p"),
            ("http://h.com/p?a=1&a=0&Z=9", "http://h.com/p?Z=9&a=0&a=1"),  # sorted, dups kept
            ("ftp://Files.org:21/pub", "ftp://files.org:21/pub"),  # :21 not a stripped default
            ("not a url", None),
            ("", None),
        ],
    )
    def test_normal_form(self, spark, raw, want):
        assert _canon_one(spark, raw) == want

    def test_utm_strip_is_case_insensitive_on_key(self, spark):
        assert _canon_one(spark, "http://h.com/?UTM_SOURCE=x&a=1") == "http://h.com/?a=1"

    def test_fragment_only_difference_collapses(self, spark):
        a = _canon_one(spark, "http://h.com/p#top")
        b = _canon_one(spark, "http://h.com/p#bottom")
        assert a == b == "http://h.com/p"


class TestDedupByCanonicalUrl:
    def test_groups_variants(self, spark):
        pages = spark.createDataFrame(
            [
                (1, "HTTP://A.COM:80/x?utm_source=s"),
                (2, "http://a.com/x"),
                (3, "http://a.com/x#frag"),
                (4, "https://b.com/y"),
                (5, "garbage"),
            ],
            "page_id long, url string",
        )
        rows = {r["canonical_url"]: r for r in webtext.dedup_by_canonical_url(pages).collect()}
        assert set(rows) == {"http://a.com/x", "https://b.com/y"}
        a = rows["http://a.com/x"]
        assert (a["n_raw"], a["n_pages"], a["canonical_page_id"]) == (3, 3, 1)


class TestDedupLines:
    def test_corpus_boilerplate_removed(self, spark):
        # 2-word lines; "cookie banner" appears in 3 docs -> dropped
        docs = spark.createDataFrame(
            [
                (1, "cookie banner alpha beta"),
                (2, "cookie banner gamma delta"),
                (3, "cookie banner epsilon zeta"),
                (4, "unique text only here"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup_lines(docs, words_per_line=2, min_count=3).collect()
        }
        assert out[1]["clean_text"] == "alpha beta"
        assert out[1]["n_lines_removed"] == 1
        assert out[4]["clean_text"] == "unique text\nonly here"
        assert out[4]["n_lines_removed"] == 0

    def test_doc_fully_removed_still_present(self, spark):
        docs = spark.createDataFrame(
            [(i, "same line") for i in range(3)], "doc_id long, text string"
        )
        out = dedup_lines(docs, words_per_line=2, min_count=3).collect()
        assert len(out) == 3
        assert all(r["clean_text"] == "" and r["n_lines_kept"] == 0 for r in out)

    def test_order_preserved_below_threshold(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "c d a b")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r["clean_text"] for r in dedup_lines(docs, words_per_line=2).collect()}
        assert out[1] == "a b\nc d\ne f"
        assert out[2] == "c d\na b"
