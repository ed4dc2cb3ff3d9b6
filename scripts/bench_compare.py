"""Round-over-round bench comparison: diff two bench_detail.json files
per query (NEVER totals — the catalog grows between rounds) with the
side-table caveat applied: a query family shares materialized side
tables, so a per-query delta inside one family is only meaningful at the
family level (the FIRST consumer bills the build — NOTES.md).

Usage: python scripts/bench_compare.py OLD.json NEW.json [--threshold 1.5]
Exit 1 when any non-family-explained query regressed past threshold x.
"""

from __future__ import annotations

import argparse
import json

# Queries that share session side tables: deltas are judged on the family
# SUM because the build bills whoever runs first in catalog order.
FAMILIES = {
    "lsh": [
        "near_dup_components", "near_dup_verified_pairs", "near_dup_keep_best",
        "near_dup_canonical_ids", "minhash_band_buckets", "minhash_candidate_pairs",
        "minhash_incremental_pairs", "curated_documents", "curated_documents_multimodal",
        "curated_documents_best",
    ],
    "simhash": ["simhash_documents", "simhash_near_pairs", "simhash_incremental_pairs"],
    "kmeans": ["kmeans_clusters", "semantic_dedup_keep", "ivf_ann_top3"],
    "lang_model": ["ngram_lang_classifier", "lang_confusion_matrix"],
    # r2-cont additions sharing side tables / collected models
    "pagerank": ["near_dup_pagerank"],  # bills the LSH marts if first consumer
    "pq": ["pq_adc_top3"],              # codebook + codes side tables
    "bpe": ["bpe_merge_table", "bpe_tokenized_docs", "bpe_fertility_by_lang"],
    "dsir": ["dsir_importance_weights", "dsir_selected_corpus"],
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    old = json.load(open(args.old))["queries"]
    new = json.load(open(args.new))["queries"]
    fam_of = {q: f for f, qs in FAMILIES.items() for q in qs}

    regressions: list[str] = []
    print(f"{len(new)} queries in NEW ({len(set(new) - set(old))} added, "
          f"{len(set(old) - set(new))} removed)")

    fam_old: dict[str, float] = {}
    fam_new: dict[str, float] = {}
    for q in set(old) & set(new):
        f = fam_of.get(q)
        if f:
            fam_old[f] = fam_old.get(f, 0.0) + old[q]
            fam_new[f] = fam_new.get(f, 0.0) + new[q]
            continue
        if new[q] > args.threshold * old[q] and new[q] - old[q] > 0.5:
            regressions.append(f"{q}: {old[q]:.2f}s -> {new[q]:.2f}s")
    for f in sorted(fam_old):
        if fam_new[f] > args.threshold * fam_old[f] and fam_new[f] - fam_old[f] > 1.0:
            regressions.append(f"family {f}: {fam_old[f]:.2f}s -> {fam_new[f]:.2f}s")
        else:
            print(f"  family {f}: {fam_old[f]:.2f}s -> {fam_new[f]:.2f}s (ok)")

    for r in regressions:
        print(f"  [REGRESSION] {r}")
    if not regressions:
        print("  no per-query regressions past "
              f"{args.threshold}x (+0.5s absolute floor)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
