"""Bloom-prefiltered exact-dedup ingest (operators/dedupe.py
bloom_route_ingest / bloom_bitmap): routing EXACTNESS at any filter size,
the no-false-negative membership guarantee, forced false positives, and
the bitmap's mergeability (the property that makes it an O(delta) mart)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark.operators.dedupe import (
    bloom_bitmap,
    bloom_route_ingest,
    content_hash,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mart(spark, texts):
    return _docs(spark, [(i, t) for i, t in enumerate(texts)]).select(
        content_hash("text").alias("text_hash")
    )


class TestRoutingExactness:
    def _check(self, spark, n_bits):
        mart_texts = [f"doc {i}" for i in range(40)]
        delta = _docs(
            spark,
            [(100 + i, f"doc {i}") for i in range(0, 20)]  # dups
            + [(200 + i, f"fresh {i}") for i in range(30)]  # new
            + [(300, "fresh 0")],  # in-delta duplicate of a new doc
        )
        out = bloom_route_ingest(
            _mart(spark, mart_texts), delta, n_bits=n_bits, n_hashes=3
        ).collect()
        routes = {r["text_hash"]: r["bloom_route"] for r in out}
        mart_hashes = {
            r["text_hash"] for r in _mart(spark, mart_texts).distinct().collect()
        }
        # EXACT at any n_bits: dup_in_mart == semi-join set; new+fp_new ==
        # anti-join set; a true dup must NEVER route 'new' (no false negatives)
        assert {h for h, r in routes.items() if r == "dup_in_mart"} == {
            h for h in routes if h in mart_hashes
        }
        assert {h for h, r in routes.items() if r in ("new", "fp_new")} == {
            h for h in routes if h not in mart_hashes
        }
        # delta-internal dedup: "fresh 0" appears once with 2 copies, min id
        row = next(r for r in out if r["n_delta_copies"] == 2)
        assert row["canonical_doc_id"] == 200
        return out

    def test_exact_with_roomy_filter(self, spark):
        out = self._check(spark, n_bits=1 << 16)
        assert all(r["bloom_route"] != "fp_new" for r in out)  # no FPs when roomy

    def test_exact_with_saturated_filter_forces_fp(self, spark):
        out = self._check(spark, n_bits=16)  # 40*3 positions into 16 bits
        assert any(r["bloom_route"] == "fp_new" for r in out)  # FP path exercised
        # saturated: every bit set, so no hash can route 'new'
        assert all(r["bloom_route"] != "new" for r in out)

    def test_empty_mart_routes_everything_new(self, spark):
        mart = _mart(spark, []).filter(F.lit(False))
        delta = _docs(spark, [(1, "a"), (2, "b")])
        out = bloom_route_ingest(mart, delta, n_bits=64).collect()
        assert sorted(r["bloom_route"] for r in out) == ["new", "new"]


class TestBitmapMerge:
    def test_or_merge_equals_union_bitmap(self, spark):
        a = _mart(spark, [f"a{i}" for i in range(25)])
        b = _mart(spark, [f"b{i}" for i in range(25)])
        union_bm = {
            r["word_idx"]: r["bits"]
            for r in bloom_bitmap(a.unionByName(b), n_bits=256).collect()
        }
        merged = (
            bloom_bitmap(a, n_bits=256)
            .unionByName(bloom_bitmap(b, n_bits=256))
            .groupBy("word_idx")
            .agg(F.bit_or("bits").alias("bits"))
            .collect()
        )
        assert {r["word_idx"]: r["bits"] for r in merged} == union_bm

    def test_words_pack_32_bits(self, spark):
        for r in bloom_bitmap(_mart(spark, ["x", "y", "z"]), n_bits=128).collect():
            assert 0 <= r["word_idx"] < 4
            assert 0 < r["bits"] < (1 << 32)  # bit 63 never touched
