"""Corpus assembly operators: fixed-window chunking, cross-document
duplicated n-gram fraction, temperature-based mixture sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark.operators.chunking import chunk_documents
from pipeline_etl_ecommerce_spark.operators.sampling import temperature_mixture_sample
from pipeline_etl_ecommerce_spark.operators.textstats import dup_ngram_fraction


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
        (2, " ".join(f"u{i}" for i in range(4))),  # 4 tokens: one short chunk
        (3, "solo"),  # 1 token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_non_overlapping_covers_every_token(docs):
    out = chunk_documents(docs, "text", "doc_id", chunk_size=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 10 tokens / size 4 -> starts 0,4,8 with lengths 4,4,2
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_index"])
    assert [r["chunk_start"] for r in d1] == [0, 4, 8]
    assert [r["chunk_tokens"] for r in d1] == [4, 4, 2]
    assert " ".join(r["chunk_text"] for r in d1) == " ".join(f"t{i}" for i in range(10))
    assert [r["chunk_text"] for r in by_doc[3]] == ["solo"]


def test_chunking_overlap_stride(docs):
    out = chunk_documents(docs, "text", "doc_id", chunk_size=4, stride=2).collect()
    d1 = sorted((r for r in out if r["doc_id"] == 1), key=lambda r: r["chunk_index"])
    assert [r["chunk_start"] for r in d1] == [0, 2, 4, 6, 8]
    # consecutive chunks share chunk_size - stride = 2 tokens
    first, second = d1[0]["chunk_text"].split(" "), d1[1]["chunk_text"].split(" ")
    assert first[2:] == second[:2]
    # every chunk except the tail is exactly chunk_size
    assert [r["chunk_tokens"] for r in d1] == [4, 4, 4, 4, 2]


def test_chunking_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, "text", "doc_id", chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, "text", "doc_id", chunk_size=4, stride=-1)


def test_dup_ngram_fraction_flags_shared_boilerplate(spark):
    boiler = "all rights reserved by example corp"  # 6 tokens -> 2 5-grams
    rows = [
        (1, boiler + " unique tail one two three"),
        (2, boiler + " other ending words four five"),
        (3, "completely different text with no shared grams at all"),
        (4, "tiny doc"),  # < 5 tokens: no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_ngram_fraction(df, "text", "doc_id", n=5).collect()}
    assert 4 not in out
    assert out[3]["n_dup_grams"] == 0 and out[3]["dup_gram_frac"] == 0.0
    # docs 1 and 2 share exactly the 2 grams fully inside the boilerplate
    for d in (1, 2):
        assert out[d]["n_grams"] == 7  # 11 tokens -> 7 grams
        assert out[d]["n_dup_grams"] == 2
        assert out[d]["dup_gram_frac"] == pytest.approx(2 / 7, abs=1e-6)


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [(i, "en" if i < 900 else ("fr" if i < 990 else "zh")) for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_mixture_alpha_one_is_proportional(skewed):
    # alpha=1 -> w_s = n_s / total -> keep_rate = budget/total for every
    # stratum: plain uniform downsampling, no rebalancing
    out = temperature_mixture_sample(skewed, "lang", "doc_id", alpha=1.0, budget=200)
    rates = {r["lang"]: r["keep_rate"] for r in out.select("lang", "keep_rate").distinct().collect()}
    assert all(v == pytest.approx(0.2, abs=1e-6) for v in rates.values())


def test_mixture_flattens_skew_and_caps_rare(skewed):
    out = temperature_mixture_sample(skewed, "lang", "doc_id", alpha=0.5, budget=200)
    rates = {r["lang"]: r["keep_rate"] for r in out.select("lang", "keep_rate").distinct().collect()}
    # w ~ sqrt(n): en 900->30, fr 90->~9.49, zh 10->~3.16 (sum ~42.65)
    # en rate = 200*(30/42.65)/900 ~ 0.156; zh = 200*(3.16/42.65)/10 -> capped 1.0
    assert rates["zh"] == 1.0
    assert rates["en"] < rates["fr"] < 1.0
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["zh"] == 10  # rare stratum fully kept
    # achieved total is near the budget
    assert sum(counts.values()) == pytest.approx(200, rel=0.2)


def test_mixture_is_deterministic_across_layouts(skewed):
    a = {r["doc_id"] for r in temperature_mixture_sample(skewed, "lang", "doc_id", budget=300).collect()}
    b = {
        r["doc_id"]
        for r in temperature_mixture_sample(
            skewed.repartition(13, "doc_id"), "lang", "doc_id", budget=300
        ).collect()
    }
    assert a == b


def test_hash_topk_sample_exact_quota(skewed):
    from pipeline_etl_ecommerce_spark.operators.sampling import hash_topk_sample

    out = hash_topk_sample(skewed, "lang", "doc_id", k=25)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 25, "fr": 25, "zh": 10}  # zh has only 10 rows
    # identity-determined membership: layout-independent
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in hash_topk_sample(skewed.repartition(9), "lang", "doc_id", k=25).collect()}
    assert a == b
    with pytest.raises(ValueError):
        hash_topk_sample(skewed, "lang", "doc_id", k=0)
