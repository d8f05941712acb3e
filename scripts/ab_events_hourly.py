"""A/B: events_hourly determinism tax — the oracle-parity fixed-point
form (quantize to 1e-6, decimal(25,0) sum, integer HALF_UP division;
__spark_entry__.events_hourly_frame deterministic=True) vs the
hot-production double-sum form (deterministic=False) — on the same
20M-row synthesized events table, alternating runs, median of N, with
the bench-protocol cpu-ceiling probes around the timed block.

The input mirrors /root/testdata events: ts over ~30 days, 5 event
types, 6-decimal values (derived deterministically from the row id —
no RNG, so reruns time the identical table).

Usage: python scripts/ab_events_hourly.py [n_rows] [reps]
Appends one JSON line to BENCH/AB_EVENTS_HOURLY.jsonl and prints it.
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

from pyspark.sql import functions as F

from bench_scaling import cpu_ceiling
from data_check_spark.session import get_spark


def synth_events(spark, n: int, partitions: int = 256):
    """Deterministic events-shaped frame: (ts, event_type, value) with
    ≤6-decimal values (the precision envelope events_hourly_frame's
    fixed-point mode documents)."""
    return (
        spark.range(0, n, 1, partitions)
        .select(
            (
                F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), (F.col("id") % 2592000).cast("double"))
            ).alias("ts"),
            F.concat(F.lit("type_"), (F.xxhash64("id") % 5).cast("string")).alias("event_type"),
            # 6-dp value in [0, 1000): integer micro-units / 1e6
            ((F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000_000))).cast("double") / 1e6).alias("value"),
        )
    )


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-events", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import events_hourly_frame

    build = os.path.join(REPO, "build")
    os.makedirs(build, exist_ok=True)
    p = f"{build}/events_{n_rows}.parquet"
    if not os.path.exists(p):
        synth_events(spark, n_rows).write.parquet(p)
    e = spark.read.parquet(p)

    c_pre = cpu_ceiling(8, 32)
    variants = {
        "fixed_point_decimal": lambda: events_hourly_frame(e, deterministic=True),
        "double_sum": lambda: events_hourly_frame(e, deterministic=False),
    }
    for fn in variants.values():  # warmup
        _force(fn())
    times = {v: [] for v in variants}
    for _ in range(reps):
        for v, fn in variants.items():  # alternate within each rep
            t0 = time.perf_counter()
            _force(fn())
            times[v].append(round(time.perf_counter() - t0, 3))
    c_post = cpu_ceiling(8, 32)

    # the two modes must agree on group keys/counts exactly and on
    # values to aggregation-noise tolerance
    a = {(r["hour"], r["event_type"]): r for r in variants["fixed_point_decimal"]().collect()}
    b = {(r["hour"], r["event_type"]): r for r in variants["double_sum"]().collect()}
    agree = set(a) == set(b) and all(
        a[k]["n"] == b[k]["n"]
        and abs(a[k]["avg_value"] - b[k]["avg_value"]) <= 2e-4
        and abs(a[k]["sum_value"] - b[k]["sum_value"]) <= 0.02
        for k in a
    )

    med = {v: round(statistics.median(ts), 3) for v, ts in times.items()}
    out = {
        "input": f"events_{n_rows}",
        "medians": med,
        "determinism_tax": round(med["fixed_point_decimal"] / med["double_sum"], 3),
        "all_runs": times,
        "modes_agree": agree,
        "n_groups": len(a),
        "ceiling_pre": round(c_pre, 3),
        "ceiling_post": round(c_post, 3),
    }
    line = json.dumps(out)
    print(line, flush=True)
    with open(os.path.join(REPO, "BENCH", "AB_EVENTS_HOURLY.jsonl"), "a") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
