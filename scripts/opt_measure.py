"""Optimization-round measurement harness (guide §1): isolate queries with
the noop sink, time min-of-N, and capture .explain("formatted") to
plans/$SPARK_GRAFT_PLANS_TAG (default r11)/<query>_<tag>.txt so plan claims are checkable offline.

Usage:
  python scripts/opt_measure.py --explain --tag before q1 q2 ...
  python scripts/opt_measure.py --time --reps 3 q1 q2 ...
  python scripts/opt_measure.py --time --reps 3 --all-over 1.0   # every query
                                  whose last bench_detail time exceeds 1.0s

Timing methodology matches bench.py exactly: warm-up flagship run, shared
side tables built first (billed separately), per-query min across reps
through the noop sink. Explains are captured WITHOUT executing (lazy rows
only — executed rows run their harness on call, so --explain skips names
in EXECUTED_ROWS and notes why).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_etl_ecommerce_spark.session import get_spark  # noqa: E402
from pipeline_etl_ecommerce_spark import testdata_queries  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_DIR = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_TAG", "r11"))

# Rows whose callable EXECUTES work (streams, sink writes, backfills) before
# returning a materialized result: their returned DF is a localCheckpoint /
# parquet read-back, so .explain() is meaningless and building them is not
# "lazy". Timing still works (the harness IS the query).
EXECUTED_PREFIXES = ("streaming_", "sink_", "rest_", "queue_")
EXECUTED_ROWS = {
    "backfill_daily_rollup", "bucketed_colocated_join", "incremental_agg_mart",
    "last_event_per_user", "insert_if_absent_users", "keyed_update_retailprice",
    "rocksdb_user_totals_executed", "json_quarantine_ingest",
    "streaming_chunk_replace", "merge_scd2_history", "sp_timezone_daily_rollup",
}


def is_executed(name: str) -> bool:
    return name.startswith(EXECUTED_PREFIXES) or name in EXECUTED_ROWS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--all-over", type=float, default=None)
    ap.add_argument("--no-warm", action="store_true",
                    help="skip warm_side_tables (explain-only shortcut for rows without marts)")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("opt-measure", cpus=cpus, shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    qs = testdata_queries.queries()
    names = list(args.queries)
    if args.all_over is not None:
        detail = json.load(open(os.path.join(REPO, "bench_detail.json")))
        names += [q for q, s in detail["queries"].items() if s >= args.all_over and q not in names]
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    os.makedirs(PLANS_DIR, exist_ok=True)

    t0 = time.perf_counter()
    if not args.no_warm:
        qs["flagship_consolidation"](spark, sf_dir).write.format("noop").mode("overwrite").save()
        testdata_queries.warm_side_tables(spark, sf_dir)
        print(f"[warm] side tables in {time.perf_counter() - t0:.1f}s", flush=True)

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if args.explain:
            if is_executed(name):
                print(f"[explain] {name}: SKIP (executed row — harness, not plan)")
            else:
                df = fn(spark, sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                path = os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt")
                with open(path, "w") as fh:
                    fh.write(buf.getvalue())
                txt = buf.getvalue()
                n_ex = txt.count("Exchange")
                print(f"[explain] {name}: {path} (Exchange x{n_ex})")
        if args.time:
            spark.sparkContext.setJobDescription(f"opt:{name}")
            samples = []
            for _ in range(args.reps):
                t = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t)
            spark.sparkContext.setJobDescription(None)
            results[name] = {
                "min": round(min(samples), 3),
                "max": round(max(samples), 3),
                "samples": [round(s, 3) for s in samples],
            }
            print(f"[time] {name}: min={min(samples):.3f}s max={max(samples):.3f}s", flush=True)

    if results:
        print(json.dumps({"timings": {k: v["min"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
