"""A/B: referential-check plan shapes on a url-keyed fact table — the
regime the Bloom gate (operators/bloom.py) targets: fact keys are
high-cardinality (every url distinct), so the anti-join paths must
shuffle the full key set while the bloom gate classifies rows
map-only and shuffles only violations.

Variants, same inputs, alternating runs, median of N, bench-protocol
cpu-ceiling probes around the timed block:
  * join_raw    — referential_violations (raw keys; 20M-url dim is far
                  above the broadcast cap → shuffled anti-join)
  * join_hashed — referential_violations(hash_keys=True) (8 B
                  surrogates on both shuffle sides)
  * bloom_fast  — referential_violations_bloom with a PREBUILT filter
                  (the production amortization: a dimension snapshot
                  is built once and probed by every validation run);
                  map-only probe + violations-only census
  * bloom_exact — same prebuilt filter + residual anti-join
                  (byte-equal to join_raw)
The one-time bitmap build is timed separately (bloom_build_sec).

In-run verification: bloom_fast flagged ⊆ exact with identical per-key
counts (precision 1.0) and its measured recall is reported; bloom_exact
must equal join_raw exactly.

Usage: python scripts/ab_refint_bloom.py [n_pages] [reps]
Prints one JSON line with per-variant medians + ceilings
(appended to BENCH/AB_REFINT_BLOOM.jsonl by hand).
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

from bench_scaling import cpu_ceiling, materialize
from data_check_spark.operators.bloom import build_key_bloom, referential_violations_bloom
from data_check_spark.operators.refint import referential_violations
from data_check_spark.session import get_spark


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-refint-bloom", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    build = os.path.join(REPO, "build")
    os.makedirs(build, exist_ok=True)
    p1, _ = materialize(n_pages, build)
    fact = spark.read.parquet(p1)
    # dimension snapshot: all urls except a deterministic 0.1% slice →
    # ~0.1% of fact keys violate (the rare-violation production shape)
    dim = fact.select("url").filter(F.pmod(F.xxhash64("url"), F.lit(1000)) != 0)

    t0 = time.perf_counter()
    bloom = build_key_bloom(dim, "url", fpp=1e-3)
    build_sec = round(time.perf_counter() - t0, 3)

    variants = {
        "join_raw": lambda: referential_violations(fact, "url", dim, "url"),
        "join_hashed": lambda: referential_violations(
            fact, "url", dim, "url", hash_keys=True
        ),
        "bloom_fast": lambda: referential_violations_bloom(
            fact, "url", dim, "url", bloom=bloom
        ),
        "bloom_exact": lambda: referential_violations_bloom(
            fact, "url", dim, "url", bloom=bloom, exact=True
        ),
    }

    c_pre = cpu_ceiling(8, 32)
    for fn in variants.values():  # untimed warmup
        _force(fn())
    times = {v: [] for v in variants}
    for _ in range(reps):
        for v, fn in variants.items():
            t0 = time.perf_counter()
            _force(fn())
            times[v].append(round(time.perf_counter() - t0, 3))
    c_post = cpu_ceiling(8, 32)

    exact = {r["ref_key"]: r["n_rows"] for r in variants["join_raw"]().collect()}
    fast = {r["ref_key"]: r["n_rows"] for r in variants["bloom_fast"]().collect()}
    bexact = {r["ref_key"]: r["n_rows"] for r in variants["bloom_exact"]().collect()}
    precision_ok = set(fast) <= set(exact) and all(
        exact[k] == n for k, n in fast.items()
    )
    out = {
        "input": f"pages_{n_pages}_urlkeyed_dim_99.9pct",
        "n_violating_keys_exact": len(exact),
        "medians": {v: round(statistics.median(ts), 3) for v, ts in times.items()},
        "all_runs": times,
        "bloom_fast_precision_1": bool(precision_ok),
        "bloom_fast_key_recall": round(len(fast) / max(len(exact), 1), 6),
        "bloom_exact_matches_join": bexact == exact,
        "bloom_build_sec": build_sec,
        "bloom_bitmap_mib": round(bloom.bitmap.nbytes / 2**20, 2),
        "ceiling_pre": round(c_pre, 3),
        "ceiling_post": round(c_post, 3),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
