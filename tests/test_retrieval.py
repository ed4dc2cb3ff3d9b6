"""BM25 / tf-idf retrieval scoring semantics."""

from __future__ import annotations

import pytest

from pipeline_etl_ecommerce_spark.operators.retrieval import bm25_scores, tfidf_top_terms


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark shuffle shuffle broadcast join"),  # heavy on query terms
        (2, "spark table scan filter project limit"),  # one query term
        (3, "row group parquet footer stats pruning"),  # no query terms
        (4, "zebra zebra zebra spark"),  # rare term dominates tf-idf
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_matching_docs(corpus):
    got = {r["doc_id"]: r.asDict() for r in
           bm25_scores(corpus, "text", "doc_id", ["spark", "shuffle", "broadcast"]).collect()}
    assert set(got) == {1, 2, 4}  # doc 3 matches nothing and is omitted
    assert got[1]["n_terms_matched"] == 3 and got[2]["n_terms_matched"] == 1
    assert got[1]["score"] > got[2]["score"] > 0
    assert got[1]["score"] > got[4]["score"]


def test_tfidf_surfaces_distinctive_terms(corpus):
    got = {}
    for r in tfidf_top_terms(corpus, "text", "doc_id", top_k=1).collect():
        got[r["doc_id"]] = r["term"]
    assert got[4] == "zebra"  # rare + frequent within the doc
    assert got[1] == "shuffle"  # tf 2 and appears in only one doc
    # 'spark' (in 3 of 4 docs) is never the most distinctive term
    assert "spark" not in got.values()


def test_inverted_index_cap_and_df(spark):
    from pipeline_etl_ecommerce_spark.operators.retrieval import inverted_index

    rows = [
        (1, "alpha beta"),
        (2, "alpha beta beta"),   # per-doc dedup: beta counted once for doc 2
        (3, "alpha gamma"),
        (4, "solo"),              # df=1 -> dropped by min_df=2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.term: r for r in inverted_index(df, "text", "doc_id", min_df=2, max_postings=2).collect()}
    assert set(out) == {"alpha", "beta"}
    # df counts ALL matching docs even when postings are capped below that
    assert out["alpha"].df == 3 and out["alpha"].postings == "1,2"
    assert out["beta"].df == 2 and out["beta"].postings == "1,2"


def test_inverted_index_single_exchange_after_tokens(spark):
    from pipeline_etl_ecommerce_spark.operators.retrieval import inverted_index

    df = spark.createDataFrame([(1, "a b"), (2, "a c")], "doc_id long, text string")
    plan = inverted_index(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    # the df window, rank cap, and postings agg all share the term hash
    # partitioning: exactly one exchange downstream of the token explode
    assert plan.count("Exchange") == 1
