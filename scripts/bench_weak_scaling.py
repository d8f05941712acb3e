"""WEAK-scaling evidence for the 8→32 regime (VERDICT r3 next #4):
run the full validation suite on 20M pages at 8 cores vs 80M pages at
32 cores — per-core working set constant — and report docs/sec parity.

Why this closes the r3 argument: the STRONG 8:32 pair measured 0.563
with attribution (not demonstration) that the shortfall is this box's
shared DRAM ceiling, not the plans. Under weak scaling the per-core
data volume stays fixed, so the DRAM-bandwidth-per-core confound
largely drops out; remaining loss is genuine coordination/shuffle
overhead — the quantity that actually predicts a 4N-node cluster,
where each node brings its own memory buses.

weak_efficiency = docs_per_sec(32 cores, 80M) / (4 x docs_per_sec(8
cores, 20M)); ideal 1.0 (same wall-clock at both sizes).

Reuses bench_scaling's protocol verbatim: taskset-pinned spark-submit
workers, tmpfs shuffle, pure-CPU ceiling probes around each attempt,
att_score ranking (run-spread first, probe distance second), quiet
window = probes in [0.8, 1.15] and per-run spread <= 1.2.

Usage: python scripts/bench_weak_scaling.py [attempts] [lo_cores]
[hi_cores] [lo_n_pages] [hi_n_pages] (defaults 3 8 32 20M 80M; tables
resolved as build/pages_{n}.parquet / build/pages_v2_{n}.parquet).
Appends attempt records to BENCH/WEAK_SCALING_ATTEMPTS_r4.jsonl and
prints the final JSON.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import (  # noqa: E402
    cpu_ceiling,
    make_zip,
    run_worker,
    window_accepted,
    window_score,
)

_argv = sys.argv + [None] * 6
LO_CORES = int(_argv[2] or 8)
HI_CORES = int(_argv[3] or 32)
LO_N = int(_argv[4] or 20_000_000)
HI_N = int(_argv[5] or 80_000_000)
LO_PAGES = f"{REPO}/build/pages_{LO_N}.parquet"
LO_V2 = f"{REPO}/build/pages_v2_{LO_N}.parquet"
HI_PAGES = f"{REPO}/build/pages_{HI_N}.parquet"
HI_V2 = f"{REPO}/build/pages_v2_{HI_N}.parquet"


def spread(runs: list) -> float:
    return max(runs) / min(runs)


def att_score(att: dict) -> tuple:
    # shared protocol scoring (bench_scaling.window_score)
    s = max(spread(att["r_lo"]["all_runs_sec"]), spread(att["r_hi"]["all_runs_sec"]))
    return window_score(att["accepted"], s, att["ceiling_pre"], att["ceiling_post"])


def main() -> None:
    attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    zpath = make_zip(f"{REPO}/build")
    log = open(f"{REPO}/BENCH/WEAK_SCALING_ATTEMPTS_r4.jsonl", "a")
    best = None
    for i in range(attempts):
        c_pre = cpu_ceiling(LO_CORES, HI_CORES)
        r_lo = run_worker(LO_CORES, zpath, LO_PAGES, LO_V2)
        r_hi = run_worker(HI_CORES, zpath, HI_PAGES, HI_V2)
        c_post = cpu_ceiling(LO_CORES, HI_CORES)
        # weak scaling: per-core throughput parity — the core ratio,
        # not the doc ratio, is the ideal-speedup denominator
        eff = r_hi["docs_per_sec"] / ((HI_CORES / LO_CORES) * r_lo["docs_per_sec"])
        att = {
            "mode": "weak", "attempt": i,
            "lo": {"cores": LO_CORES, "docs": r_lo["docs"]},
            "hi": {"cores": HI_CORES, "docs": r_hi["docs"]},
            "ceiling_pre": round(c_pre, 3), "ceiling_post": round(c_post, 3),
            "spread_lo": round(spread(r_lo["all_runs_sec"]), 3),
            "spread_hi": round(spread(r_hi["all_runs_sec"]), 3),
            "r_lo": r_lo, "r_hi": r_hi,
            "weak_efficiency": round(eff, 3),
        }
        att["accepted"] = window_accepted(
            c_pre, c_post, max(att["spread_lo"], att["spread_hi"])
        )
        log.write(json.dumps(att) + "\n")
        log.flush()
        print(json.dumps({"attempt_result": att}), flush=True)
        if best is None or att_score(att) > att_score(best):
            best = att
        if att["accepted"]:
            break
    print(json.dumps({"weak_scaling_best": best}))


if __name__ == "__main__":
    main()
