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
