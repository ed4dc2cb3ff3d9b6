"""Scaled-SF parallelism bench (r10 verdict item 2).

The r10 rounds established that the sf0.1 bench is overhead-bound: the
driver's own 8-core and 32-core runs landed within 4% of each other
(198.6 vs 205.9 s), so a local sf0.1 delta can no longer validate a
*parallel-compute* optimization. This artifact restores that measurement:

- Synthesizes a 10x sf0.1 slice (facts x10 with shifted keys, dims fixed —
  the same deterministic synthesizer the scale-stress battery uses, minus
  its deliberately planted near-duplicates) into session scratch. The data
  is recreated from /root/testdata on EVERY run and deleted after — it is
  measurement input, never a cached result.
- Times a fixed panel of the catalog's compute-heaviest LAZY rows
  (min-of-REPS through the noop sink, shared marts pre-built and billed
  separately — bench.py's exact methodology) at the current
  $SPARK_GRAFT_CPUS.
- Merges per-core-count results into BENCH_SF1.json and computes the
  32c/8c speedup per row; the committed artifact is the pin the next
  round's scaled runs diff against.

Panel selection: compute-bound lazy rows whose scaled workload is ~linear
in the fact step. EXCLUDED by design, with reasons recorded in the
artifact: executed/streaming/sink rows (per-batch harness floor is the
documented core-insensitive cost), and the dedup/similarity family (any
duplication scheme multiplies candidate PAIRS superlinearly — ~45x per
identity group of 10 — so their 10x behaviour is governed by the stress
battery's growth gates, not a parallelism ratio).

Usage:
  SPARK_GRAFT_CPUS=32 python scripts/bench_sf1.py [--reps 2] [--copies 10]
  SPARK_GRAFT_CPUS=8  python scripts/bench_sf1.py [--reps 2] [--copies 10]
  (each invocation merges its core count into BENCH_SF1.json)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pipeline_etl_ecommerce_spark.session import get_spark  # noqa: E402
from pipeline_etl_ecommerce_spark import testdata_queries  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BENCH_SF1.json")
SF_SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 100_000_000

# The measured panel: compute-bound lazy rows, ~linear scaled workload.
PANEL = [
    # TPC-H-shaped aggregation / join / window rows
    "flagship_consolidation",
    "pricing_summary",
    "returnflag_price_stats",
    "price_mad_by_returnflag",
    "sketch_profile_lineitem",
    "order_clv_deciles",
    "yoy_part_revenue",
    "top_supplier_quarter",
    "recursive_hierarchy_rollup",
    "copurchase_part_pairs",
    "copurchase_triangles_degree",
    # text / LM-data rows (per-byte CPU: md5, regex, n-grams)
    "bpe_tokenized_docs",
    "bpe_fertility_by_lang",
    "ngram_lang_classifier",
    "lang_confusion_matrix",
    "trigram_perplexity_scores",
    "ccnet_perplexity_buckets",
    "doc_char_diversity",
    "dup_ngram_stats",
    "dsir_selected_corpus",
    # media decode rows (map-only Arrow kernels)
    "avi_frame_stats",
    "jpeg_progressive_stats",
    "warc_html_pipeline",
    "gif_decode_stats",
]

EXCLUSIONS = {
    "executed/streaming/sink/rest families": (
        "per-batch stream-machinery floor measured core-insensitive "
        "(OPTIMIZATION_r11.md item 5); a core-count ratio over them "
        "measures the harness, not parallelism"
    ),
    "dedup/similarity family (minhash/simhash/span/bitext/image)": (
        "10x duplication multiplies candidate pairs ~45x per identity "
        "group by construction; their scaling evidence is the stress "
        "battery's growth gates (STRESS_r*.json), not a wall ratio"
    ),
}


def synthesize(spark, out_dir: str, copies: int) -> None:
    """Disjoint-copy 10x synthesis: facts scale, dims fixed, keys shifted
    per copy. Unlike scale_stress.synthesize, document text gets a
    per-copy token PREFIX long enough that copies are not near-duplicates
    of each other under any of the catalog's similarity rows — the panel
    here measures parallel compute, not pair growth."""
    os.makedirs(out_dir, exist_ok=True)

    def shifted_union(name: str, key_cols: list[str], mutate=None):
        src = spark.read.parquet(os.path.join(SF_SRC, f"{name}.parquet"))
        parts = []
        for i in range(copies):
            c = src
            for k in key_cols:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
            if mutate is not None:
                c = mutate(c, i)
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))

    def text_shift(df, i):
        if i == 0:
            return df
        # deterministic distinct prefix per copy: keeps per-doc length
        # profile ~unchanged, guarantees distinct grams/signatures
        return df.withColumn(
            "text", F.concat(F.format_string("copy%d ", F.lit(i)), F.col("text"))
        ).withColumn("n_chars", F.length("text"))

    shifted_union("lineitem", ["l_orderkey"])
    shifted_union("orders", ["o_orderkey"])
    shifted_union("documents", ["doc_id"], mutate=text_shift)
    shifted_union("events", ["event_id", "user_id"])
    shifted_union("embeddings", ["vec_id"])
    for dim in ("part", "supplier", "customer", "region", "nation"):
        shutil.copyfile(
            os.path.join(SF_SRC, f"{dim}.parquet"),
            os.path.join(out_dir, f"{dim}.parquet"),
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-sf1", cpus=cpus, shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    scratch = testdata_queries._scratch_dir(prefix="sf1_bench_")
    sf_dir = os.path.join(scratch, f"sf1x{args.copies}")
    load_start = round(os.getloadavg()[0], 2)
    t0 = time.perf_counter()
    synthesize(spark, sf_dir, args.copies)
    synth_sec = round(time.perf_counter() - t0, 1)
    print(f"[synth] {args.copies}x sf0.1 -> {sf_dir} in {synth_sec}s", flush=True)

    qs = testdata_queries.queries()
    t0 = time.perf_counter()
    qs["flagship_consolidation"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    testdata_queries.warm_side_tables(spark, sf_dir)
    warm_sec = round(time.perf_counter() - t0, 1)
    print(f"[warm] marts in {warm_sec}s", flush=True)

    timings: dict[str, float] = {}
    try:
        for name in PANEL:
            spark.sparkContext.setJobDescription(f"sf1:{name}")
            samples = []
            for _ in range(args.reps):
                t = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t)
            spark.sparkContext.setJobDescription(None)
            timings[name] = round(min(samples), 3)
            print(f"[time] {name}: min={min(samples):.3f}s "
                  f"max={max(samples):.3f}s", flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    doc.setdefault("meta", {
        "source": "10x sf0.1 deterministic synthesis (facts shifted-union x copies, dims fixed)",
        "methodology": "min-of-reps through the noop sink, shared marts pre-built (billed to warm)",
        "panel_exclusions": EXCLUSIONS,
    })
    runs = doc.setdefault("runs", {})
    runs[f"cpus{cpus}"] = {
        "cpus": int(cpus),
        "copies": args.copies,
        "reps": args.reps,
        "loadavg_start": load_start,
        "loadavg_end": round(os.getloadavg()[0], 2),
        "synth_sec": synth_sec,
        "warm_sec": warm_sec,
        "total": round(sum(timings.values()), 3),
        "queries": timings,
    }
    # cross-core ratios whenever two runs exist
    keys = sorted(runs, key=lambda k: runs[k]["cpus"])
    if len(keys) >= 2:
        low, high = runs[keys[0]], runs[keys[-1]]
        ratios = {
            q: round(low["queries"][q] / high["queries"][q], 2)
            for q in high["queries"]
            if q in low["queries"] and high["queries"][q] > 0
        }
        top = sorted(high["queries"], key=lambda q: -high["queries"][q])[:20]
        top_ratios = {q: ratios[q] for q in top if q in ratios}
        doc["scaling"] = {
            "cpus_low": low["cpus"],
            "cpus_high": high["cpus"],
            "total_low": low["total"],
            "total_high": high["total"],
            "total_speedup": round(low["total"] / high["total"], 2),
            "per_query_speedup": ratios,
            "top20_by_high_cpu_wall": top_ratios,
        }
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({
        "artifact": "BENCH_SF1.json", "cpus": int(cpus),
        "total": round(sum(timings.values()), 3), "n": len(timings),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
