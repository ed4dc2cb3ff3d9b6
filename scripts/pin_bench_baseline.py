"""Pin the CURRENT bench_detail.json as the committed per-query baseline
(BENCH_BASELINE.json) that bench.py's baseline gate compares every future
run against (r7 verdict item 3).

Refuses to pin a run that isn't clean: load gate must have PASSED and
reps >= 3 (a 1-rep or loaded-host run would bake noise into the floor
every later run is judged by).

Usage: python scripts/pin_bench_baseline.py ["note for the record"]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(os.path.join(ROOT, "bench_detail.json")) as fh:
        detail = json.load(fh)
    gate = detail.get("load_gate", {})
    if gate.get("status") != "passed":
        print(f"refusing to pin: load gate {gate}")
        return 1
    if detail.get("reps", 1) < 3:
        print(f"refusing to pin: reps={detail.get('reps')} < 3")
        return 1
    baseline = {
        "pinned_from": sys.argv[1] if len(sys.argv) > 1 else "clean run",
        "sf": detail.get("sf"),
        "cpus": detail.get("cpus"),
        "reps": detail.get("reps"),
        "loadavg_start": detail.get("loadavg_start"),
        "total": detail.get("total"),
        "queries": detail["queries"],
        # Adjudication record carried with the baseline so the next reader
        # of a bench diff sees the prior round's noise verdicts in-artifact.
        "notes": {
            "debounced_events": (
                "BENCH_r07 (driver) recorded 1.86 s — 5.4x r6 — with a "
                "bit-identical physical plan; the r8 clean re-measure under "
                "the load gate recorded ~0.36 s. Adjudicated: r7 session "
                "load noise (the 47 s concurrent side-build wave), not a "
                "code regression."
            ),
            "csv_source_roundtrip": (
                "same shape: 1.46 s in BENCH_r07 vs ~0.37 s clean, plan "
                "unchanged — r7 session load noise."
            ),
        },
    }
    out = os.path.join(ROOT, "BENCH_BASELINE.json")
    with open(out, "w") as fh:
        json.dump(baseline, fh, indent=1, sort_keys=True)
    print(
        f"pinned {len(baseline['queries'])} queries "
        f"(total {baseline['total']} s, loadavg {baseline['loadavg_start']}) -> {out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
