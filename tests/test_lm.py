"""Tests for the char-trigram LM perplexity operator (operators/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark.operators.lm import (
    perplexity_scores,
    train_char_trigram_lm,
)

ALPHA = 0.5


def _py_model(texts):
    """Pure-Python replica of the smoothed conditional trigram LM."""
    tri, ctx = {}, {}
    vocab = set()
    for t in texts:
        t = t.lower()
        for i in range(len(t) - 2):
            c, n = t[i : i + 2], t[i + 2]
            tri[(c, n)] = tri.get((c, n), 0) + 1
            ctx[c] = ctx.get(c, 0) + 1
            vocab.add(n)
    return tri, ctx, len(vocab)


def _py_ppl(text, tri, ctx, v):
    t = text.lower()
    lps = [
        math.log(
            (tri.get((t[i : i + 2], t[i + 2]), 0) + ALPHA)
            / (ctx.get(t[i : i + 2], 0) + ALPHA * v)
        )
        for i in range(len(t) - 2)
    ]
    avg = sum(lps) / len(lps)
    return len(lps), avg, math.exp(-avg)


def test_perplexity_matches_hand_model(spark):
    train_texts = ["abcabcab", "the cat sat", "abab"]
    train = spark.createDataFrame([(t,) for t in train_texts], "text string")
    model = train_char_trigram_lm(train, "text")

    tri, ctx, v = _py_model(train_texts)
    assert {(r["ctx"], r["nxt"]): r["n_tri"] for r in model.collect()} == {
        k: float(c) for k, c in tri.items()
    }

    docs = spark.createDataFrame(
        [(1, "abcab"), (2, "the cat"), (3, "zzzzz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in perplexity_scores(docs, model, "text", "doc_id").collect()}
    for doc_id, text in [(1, "abcab"), (2, "the cat"), (3, "zzzzz")]:
        n, avg, ppl = _py_ppl(text, tri, ctx, v)
        assert out[doc_id]["n_grams"] == n
        assert out[doc_id]["avg_logp"] == pytest.approx(round(avg, 6), abs=1e-9)
        assert out[doc_id]["ppl"] == pytest.approx(round(ppl, 6), abs=1e-9)


def test_short_and_empty_docs_emit_nothing(spark):
    train = spark.createDataFrame([("abcdef",)], "text string")
    model = train_char_trigram_lm(train, "text")
    docs = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "abc")], "doc_id long, text string"
    )
    rows = perplexity_scores(docs, model, "text", "doc_id").collect()
    assert [r["doc_id"] for r in rows] == [3]
    assert rows[0]["n_grams"] == 1


def test_unseen_context_scores_uniform_over_vocab(spark):
    # every trigram of the scored doc has an unseen context -> each gram
    # scores ln(alpha / (alpha * V)) = ln(1/V), so ppl == V exactly
    train = spark.createDataFrame([("abcd",)], "text string")  # vocab = {c, d}
    model = train_char_trigram_lm(train, "text")
    docs = spark.createDataFrame([(1, "xyzw")], "doc_id long, text string")
    row = perplexity_scores(docs, model, "text", "doc_id").collect()[0]
    assert row["ppl"] == pytest.approx(2.0, abs=1e-9)
    assert row["avg_logp"] == pytest.approx(round(math.log(0.5), 6), abs=1e-9)


def test_case_folding_and_model_is_count_table(spark):
    train = spark.createDataFrame([("ABAB",), ("abab",)], "text string")
    model = train_char_trigram_lm(train, "text")
    rows = {(r["ctx"], r["nxt"]): r["n_tri"] for r in model.collect()}
    # both casings fold to the same grams: aba->b x2, bab-> (none; len 4: grams 'aba','bab')
    assert rows == {("ab", "a"): 2.0, ("ba", "b"): 2.0}


def test_training_ignores_short_docs(spark):
    train = spark.createDataFrame([("ab",), ("",), ("abc",)], "text string")
    model = train_char_trigram_lm(train, "text")
    assert {(r["ctx"], r["nxt"]) for r in model.collect()} == {("ab", "c")}


def test_empty_model_is_rejected(spark):
    """ADVICE r4: an empty model (no 3+-char training doc) would give
    v_chars = 0, a zero denominator, and all-NULL ppl — which silently
    DISABLES a downstream ppl <= tau gate. Reject it eagerly instead."""
    train = spark.createDataFrame([("ab",), ("",)], "text string")
    model = train_char_trigram_lm(train, "text")
    docs = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty LM model"):
        perplexity_scores(docs, model, "text", "doc_id")
