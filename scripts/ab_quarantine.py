"""A/B + scaling read for the quarantine router at web scale: route
20M synthesized pages (reusing build/pages_*.parquet when present)
under (a) the row-local rule set (not-null + the Gopher pack — the
shuffle-free projection path) and (b) the full set adding the
unique:url and fd:url key rules (key-aggregation + join-back path),
each at local[8] and local[32], median of N alternating runs with
cpu-ceiling probes around the timed block.

This is an OPERATOR read (plain local[N] sessions, no taskset/core
pinning), not the authoritative north-rule scaling protocol — see
scripts/bench_scaling.py for that. Throughput = pages / median sec;
eff = thr(32) / (4 x thr(8)).

Usage: python scripts/ab_quarantine.py [n_pages] [reps]
Appends one JSON line per (cores, variant) to BENCH/AB_QUARANTINE.jsonl.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import cpu_ceiling, materialize  # noqa: E402


def _variants():
    from data_check_spark.operators.quarantine import (
        FDRule,
        NotNullRule,
        UniqueRule,
        gopher_rules,
    )

    row_local = [NotNullRule("text"), NotNullRule("lang"), *gopher_rules()]
    full = row_local + [
        UniqueRule("url", id_col="warc_ts", keep_exemplar=False),
        FDRule("url", deps=("text",)),
    ]
    return {"row_local": row_local, "full": full}


VARIANT_NAMES = ("row_local", "full")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    build = os.path.join(REPO, "build")
    os.makedirs(build, exist_ok=True)
    p1, _ = materialize(n, build)

    from data_check_spark.operators.quarantine import route_rows
    from data_check_spark.session import get_spark

    jsonl = os.path.join(REPO, "BENCH", "AB_QUARANTINE.jsonl")

    def emit(rec: dict) -> None:
        # write-as-you-go: a crash after spark.stop() must not lose
        # an hour of timed runs (it did once — rule Columns need an
        # active session, so summary code touches VARIANT_NAMES only)
        with open(jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))

    out = []
    for cores in (8, 32):
        spark = get_spark(
            f"ab-quarantine-{cores}",
            master=f"local[{cores}]",
            shuffle_partitions=cores,
        )
        spark.sparkContext.setLogLevel("ERROR")
        df = spark.read.parquet(p1)
        c_pre = cpu_ceiling(8, 32)
        times: dict[str, list[float]] = {}
        # one untimed warmup of each variant, then alternating reps
        for name, rules in _variants().items():
            routed = route_rows(df, rules)
            routed.write.format("noop").mode("overwrite").save()
        for _ in range(reps):
            for name, rules in _variants().items():
                t0 = time.perf_counter()
                route_rows(df, rules).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.setdefault(name, []).append(time.perf_counter() - t0)
        c_post = cpu_ceiling(8, 32)
        for name, secs in times.items():
            med = statistics.median(secs)
            rec = {
                "op": "route_rows",
                "variant": name,
                "cores": cores,
                "n_pages": n,
                "sec_median": round(med, 3),
                "secs": [round(s, 3) for s in secs],
                "pages_per_sec": round(n / med, 1),
                "ceiling_pre": round(c_pre, 3),
                "ceiling_post": round(c_post, 3),
            }
            out.append(rec)
            emit(rec)
        spark.stop()

    by = {(r["variant"], r["cores"]): r for r in out}
    for name in VARIANT_NAMES:
        lo, hi = by[(name, 8)], by[(name, 32)]
        eff = hi["pages_per_sec"] / (4 * lo["pages_per_sec"])
        emit(
            {
                "ab": "quarantine_scaling",
                "variant": name,
                "thr_8": lo["pages_per_sec"],
                "thr_32": hi["pages_per_sec"],
                "eff_8_32": round(eff, 3),
            }
        )


if __name__ == "__main__":
    main()
