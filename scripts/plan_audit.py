"""Catalog-wide physical-plan audit: for EVERY driver query, count the
plan features that matter at 100 TB and fail on the ones that are never
acceptable.

Metrics per query (written to plan_audit.json):
- exchanges: shuffle count (lower is better; side-table-backed queries
  show only their residual plan)
- broadcast_joins / sortmerge_joins: join strategy mix
- python: any BatchEvalPython / ArrowEvalPython stage (hard FAIL unless
  the query is on the known Arrow-kernel list)
- cartesian: CartesianProduct / BroadcastNestedLoopJoin (hard FAIL unless
  on the known bounded-baseline list)
- codegen_spans: WholeStageCodegen regions (higher relative to operators
  means more of the plan is fused JVM code)

Plan-shape regression gate (r4 verdict item 7): before overwriting
plan_audit.json, the previous committed file (same sf_dir) is loaded as a
baseline and the run FAILS on unexplained growth in any per-query counter
that costs money at 100 TB — exchanges, python stages, nested-loop joins —
or on a broadcast→sortmerge strategy flip. Intentional changes go in
EXPLAINED_GROWTH with a reason; new queries are reported, not failed.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_etl_ecommerce_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

# Queries whose plans legitimately contain a broadcast nested-loop or
# cartesian shape: bounded brute-force baselines and scalar-constant
# broadcasts, each documented at its definition.
ALLOWED_NESTED_LOOP = {
    "knn_cosine_top3",        # broadcast query side, bounded baseline
    "semantic_search_docs",   # composes knn_cosine_top3's bounded baseline
    "semantic_decontamination",  # eval set broadcast against the corpus scan
    "ngram_jaccard_pairs",    # documented bounded verification baseline
    "collocation_lift_top20", # scalar corpus totals broadcast
    "bm25_query_scores",      # scalar corpus constants broadcast
    "corpus_training_sequences",  # mixture keep-rate scalar broadcast
    "mixture_sampled_docs",   # per-stratum keep-rate scalar broadcast
    "quality_gate_p25",       # per-lang threshold scalar broadcast
    "forecast_revenue_change",  # scalar-aggregate broadcast (Q6 shape)
    "promo_revenue_share",    # scalar promo/total broadcast (Q14 shape)
    "idle_rich_customers",    # broadcast scalar average (Q22 shape)
    "nation_market_share",    # yearly-total scalar broadcast (Q8 shape)
    "small_quantity_revenue", # per-part threshold broadcast (Q17 shape)
    "price_percentiles",      # bounded percentile-row broadcast
    "top_supplier_quarter",   # scalar max-revenue broadcast (Q15 shape)
    "freq_items_event_types", # one-row grand-total broadcast (share denom)
    "ivf_ann_top3",           # k pinned centroids broadcast against queries
    "tfidf_top_terms",        # scalar corpus constants broadcast
    "kmeans_clusters",        # k centroid rows broadcast against the corpus
    "semantic_dedup_keep",    # same centroid/assignment mart broadcast
    "watermark_d3_events",    # scalar max-date broadcast (the D-3 anchor)
    "insert_if_absent_users", # null-safe anti vs a broadcast dim key set
    "rolling_weekly_active_users",  # broadcast day-spine range join, <= 7 matches/row
    "dsir_importance_weights",  # scalar corpus-total broadcast onto the bucket table
    "dsir_selected_corpus",     # same scalar broadcast via the weight table
    "pq_adc_top3",              # m*k codebook rows broadcast (kmeans-family pattern)
    "near_dup_pagerank",        # one-row node-count broadcast per iteration
    "bpe_merge_table",          # one-row argmax merge rule broadcast per round
    "trigram_perplexity_scores",  # one-row vocab-size (V) broadcast
    "ccnet_perplexity_buckets",   # same scalar V broadcast via the scores
    "ivf_recall_at3",             # composes knn + ivf bounded baselines
    "ivf_ann_sublinear_top3",     # sqrt(n) centroid table broadcast (r7)
    "ivf_sublinear_recall_at3",   # composes knn + sublinear bounded baselines
    "ivfadc_top3",                # centroid + m*k codebook broadcasts (r7)
    "ivfadc_refined_top3",        # same broadcasts + bounded shortlist re-rank
    "ivfadc_recall_at3",          # composes knn + ivfadc bounded baselines
    "ivf_delta_list_ingest",      # base-trained centroid table broadcast onto the delta
    "bitext_margin_pairs",        # per-side sqrt(n) centroid-table broadcasts (probe
                                  # stage, r10); candidates come from the spilled-list
                                  # equi-join — no unbounded cross join remains
    "bitext_margin_exact_slice",  # bounded 60-per-side audit slice, exact rule
                                  # (knn_cosine_top3 shape)
    "bitext_knn_recall_at4",      # composes the bounded exact baseline (10 queries
                                  # broadcast) + the sqrt(n) centroid probe broadcast
    "bitext_margin_asymmetric",   # same per-side sqrt(n) centroid broadcasts as
                                  # bitext_margin_pairs, asymmetric side sizes
    "copurchase_part_pairs",      # one-row distinct-basket-count broadcast (the
                                  # lift denominator rides the plan instead of a
                                  # construction-time collect, r10) — O(n) probe
}

# Queries that intentionally run Arrow-batched Python kernels.
ALLOWED_PYTHON = {
    "multimodal_decode_stub",
    "multimodal_resize_stub",
    "multimodal_frame_sample",
    "ppm_decode_stats",   # REAL decode: synth mapInPandas + parser mapInPandas
    "bmp_decode_stats",   # REAL decode (bottom-up padded BGR parse)
    "ppm_resize_stats",   # REAL nearest-neighbor resample + decode of result
    "png_decode_stats",   # REAL PNG decode (zlib DEFLATE + 5 unfilters, CRC)
    "png_rgba_decode_stats",  # REAL PNG RGBA decode (bpp=4 filter distances)
    "png_resize_stats",   # REAL PNG resample: decode+resize+re-encode+decode
    "ppm_stream_frame_stats",  # REAL P6-stream split + per-frame decode
    "wav_decode_stats",   # REAL RIFF/WAVE chunk-walk decode (audio leg)
    "jpeg_decode_stats",  # REAL baseline-JPEG encode + decode + band check (r7)
    "png_palette_decode_stats",  # REAL palette-PNG decode (PLTE expansion, r7)
    "png_gray_decode_stats",     # REAL grayscale-PNG decode (r7)
    "png_colorkey_decode_stats",  # REAL color-key tRNS decode -> RGBA (r8)
    "png_16bit_decode_stats",     # REAL depth-16 decode (BE pairs, bpp=6) (r8)
    "wav_audio_features",         # REAL PCM feature extraction (energy/ZCR) (r8)
    "warc_record_parse",          # REAL WARC/gzip-member record parse (r8)
    "avi_frame_stats",            # REAL AVI/MJPEG demux + sampled-frame decode (r8)
    "warc_html_pipeline",         # REAL WARC walk + HTML body decode (e2e, r8)
    "gif_decode_stats",           # REAL GIF/LZW decode (r8)
    "gif_resize_stats",           # REAL GIF decode+resample+re-encode (r8)
    "wav_frame_features",         # REAL framed audio features (hop/window, r8)
    "gif_anim_frame_stats",       # REAL animated-GIF sampling (LZW composite, r8)
    "png_lowdepth_decode_stats",  # REAL sub-byte-depth PNG decode (r8)
    "jpeg_progressive_stats",     # REAL progressive-JPEG decode (Annex G, r8)
    "image_dhash",                # REAL PPM decode + perceptual dHash kernel (r9)
    "image_dhash_near_pairs",     # same dHash kernel feeding the band join (r9)
    "udtf_chunk_windows",  # Python UDTF (BatchEvalPythonUDTF) — API surface
    "ivf_ann_top3",
    "model_scored_documents",
    "curated_documents_multimodal",
    "bitext_margin_pairs",   # Arrow cogrouped cosine-block kernel (r10): bit-identical
                             # to the JVM fold, vectorized per inverted list — the
                             # interpreted HOF fold measured 3.1-3.7 s/leg at sf0.1
    "bitext_knn_recall_at4",  # audits the same Arrow kernel leg vs the exact rule
    "bitext_margin_asymmetric",  # same Arrow cogrouped cosine kernel, asymmetric sides
    "image_dhash",            # r10: reads the mixed-format dhash MART; the persisted
                              # plan prints the mart's synth+decode Arrow kernels
                              # inside InMemoryRelation (build runs once per session)
    "image_dhash_near_pairs",  # same mart, same cached-plan kernels
    "image_dedup_canonical",   # same mart feeding CC + keep-best (both pure JVM)
    "image_dhash_far_pairs",   # same mart feeding the multi-probe band join (r10)
}


# Per-query intentional plan-shape changes vs the committed baseline, with
# the reason growth is acceptable. Clear entries once the new baseline is
# committed (they only suppress the delta against the OLD file).
#
# Cleared r8 (verdict item 8): the committed r7 baseline includes every
# previously-explained plan (media/DSIR/kmeans widens, the banded sketch
# oracle, the prefix-scan peak query), so all prior entries were dead
# weight that would have masked a future REAL growth on those queries.
# The widen adjudications themselves now live at their definitions
# (importance._widen, clustering._assign, multimodal.synthesize_images —
# the latter cost-BASED since r8: ppm/bmp skip the exchange, png*/jpeg
# keep it).
EXPLAINED_GROWTH: dict[str, str] = {}
# Cleared r11: the committed r10 baseline already priced in every prior
# entry (bitext IVF restructure, mart/widen sweeps, the r9 window
# replacements), and r11's _strip_cached_subtrees makes the audit count
# RESIDUAL plans only — the whole "cached mart subtree prints inside the
# consumer" class (nine r10 entries) is structurally gone, so keeping the
# entries would only mask future REAL growth on those queries. The widen
# adjudications live at their definitions (importance._widen/_widen_by,
# clustering._assign, multimodal.synthesize_images).


def _strip_cached_subtrees(plan: str) -> str:
    """Drop the INSIDE of every InMemoryRelation subtree from the printed
    plan before counting.

    A persisted side mart's build lineage (with its exchanges and AQE
    Final/Initial sections) prints once per mart REFERENCE inside every
    consumer's plan, but executes zero times per query — the cache
    materializes once per session, billed to side_table_build. Counting
    those tokens made the audit's per-query numbers depend on HOW the
    cached subtree happens to print (r10 carried nine 'mart re-widen'
    allowlist entries for exactly this textual noise, and r11's eager
    cache fill changed the printing again — materialized AQE subtrees
    print both Final and Initial plans). The per-query truth the audit
    gates is the RESIDUAL plan above the InMemoryTableScan leaves; this
    keeps it, and only it."""
    out: list[str] = []
    skip_deeper_than: int | None = None

    def depth(line: str) -> int:
        i = 0
        while i < len(line) and line[i] in " :+-*(":
            i += 1
        return i

    for line in plan.splitlines():
        d = depth(line)
        if skip_deeper_than is not None:
            if line.strip() and d > skip_deeper_than:
                continue
            skip_deeper_than = None
        out.append(line)
        if "InMemoryRelation" in line:
            skip_deeper_than = depth(line)
    return "\n".join(out)


def diff_against_baseline(
    baseline: dict, results: dict[str, dict], failures: list[str]
) -> None:
    """Fail on unexplained per-query growth of the counters that cost money
    at 100 TB; the performance analogue of the oracle hash gate."""
    base_q = baseline.get("queries", {})
    grown: list[str] = []
    for name, m in results.items():
        b = base_q.get(name)
        if b is None or "error" in m or "error" in b:
            continue
        deltas = []
        for k in ("exchanges", "python", "nested_loop"):
            if m.get(k, 0) > b.get(k, 0):
                deltas.append(f"{k} {b.get(k, 0)}->{m.get(k, 0)}")
        if m.get("sortmerge_joins", 0) > b.get("sortmerge_joins", 0) and m.get(
            "broadcast_joins", 0
        ) < b.get("broadcast_joins", 0):
            deltas.append(
                f"broadcast->sortmerge flip ({b.get('broadcast_joins', 0)}bhj/"
                f"{b.get('sortmerge_joins', 0)}smj -> {m.get('broadcast_joins', 0)}bhj/"
                f"{m.get('sortmerge_joins', 0)}smj)"
            )
        if deltas:
            msg = f"{name}: plan growth vs baseline: {', '.join(deltas)}"
            if name in EXPLAINED_GROWTH:
                print(f"  [explained] {msg} — {EXPLAINED_GROWTH[name]}")
            else:
                grown.append(msg)
    failures.extend(grown)
    new = [n for n in results if n not in base_q]
    if new:
        print(f"  new queries (no baseline): {len(new)}: {', '.join(sorted(new))}")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm every shared side mart FIRST (same setup step as bench.py):
    # otherwise the mart materializes at its first consumer in WINDOW order,
    # and the printed InMemoryRelation/AQE state inside later consumers'
    # plans shifts whenever the rotation reorders the window — r6 saw
    # phantom "plan growth" on untouched queries from exactly this
    # (minhash_candidate_pairs 2->4 exchanges during the audit, 2 in a
    # fresh session). Warming first makes the capture order-independent.
    from pipeline_etl_ecommerce_spark import testdata_queries as _tq

    _tq.warm_side_tables(spark, sf_dir)

    results: dict[str, dict] = {}
    failures: list[str] = []
    for name, fn in entrymod.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            results[name] = {"error": str(ex)[:200]}
            continue
        plan = _strip_cached_subtrees(plan)
        m = {
            "exchanges": plan.count("Exchange "),
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "sortmerge_joins": plan.count("SortMergeJoin"),
            "nested_loop": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
            "python": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")
            # r10: the bitext cosine kernel is a COGROUPED Arrow stage —
            # a distinct physical operator the counter must not miss
            + plan.count("FlatMapCoGroupsInPandas"),
            "codegen_spans": plan.count("WholeStageCodegen"),
        }
        results[name] = m
        if m["python"] and name not in ALLOWED_PYTHON:
            failures.append(f"{name}: unexpected Python stage")
        if m["nested_loop"] and name not in ALLOWED_NESTED_LOOP:
            failures.append(f"{name}: unexpected nested-loop/cartesian join")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plan_audit.json")
    if os.path.exists(out):
        with open(out) as fh:
            baseline = json.load(fh)
        if baseline.get("sf_dir") == sf_dir:
            diff_against_baseline(baseline, results, failures)
        else:
            print(f"  baseline sf_dir {baseline.get('sf_dir')} != {sf_dir}; diff skipped")
    with open(out, "w") as fh:
        json.dump({"sf_dir": sf_dir, "queries": results}, fh, indent=1, sort_keys=True)

    n_py = sum(1 for r in results.values() if r.get("python"))
    print(f"{len(results)} queries audited -> plan_audit.json")
    print(f"  python-kernel queries: {n_py} (allowed: {len(ALLOWED_PYTHON)})")
    for f in failures:
        print(f"  [FAIL] {f}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
