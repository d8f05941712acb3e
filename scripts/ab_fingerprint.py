"""A/B the FingerprintCheck cost claims at 20M pages.

Three timed variants over build/pages_20000000.parquet:

  A  suite: StatsCheck only (the baseline fused pass)
  B  suite: StatsCheck + FingerprintCheck       -> fused lineage
  C  suite A, then standalone partition_fingerprint -> second scan

"Zero extra scans" (suite.py FingerprintCheck doc) is a plan claim,
not a free-lunch claim — the md5 over the full text column is real
CPU even inside the shared scan. This script turns both into
numbers: (B−A) = the fused marginal cost; (C−A) = what a separate
lineage pass would cost; the saving is their gap (the avoided second
decode/scan of the wide text column).

Usage: python scripts/ab_fingerprint.py [pages_parquet] [reps] [cores]
Appends one JSON line to BENCH/AB_FINGERPRINT.jsonl.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from data_check_spark.operators.fingerprint import partition_fingerprint
from data_check_spark.plans.suite import CheckSuite, FingerprintCheck, StatsCheck
from data_check_spark.session import get_spark
from pyspark.sql import functions as F

FP_COLS = ["url", "text", "lang"]


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "build/pages_20000000.parquet"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(
        "ab-fingerprint", master=f"local[{cores}]", shuffle_partitions=cores * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(path).withColumn("warc_day", F.to_date("warc_ts"))
    n = pages.count()  # warm the file listing / footer cache

    stats = StatsCheck(
        thresholds={
            "text": {"max_null_rate": 0.05, "min_rows": 1},
            "lang": {"max_null_rate": 0.05},
        }
    )

    def run_a():
        CheckSuite([stats]).run(spark, pages, "warc_day").unpersist()

    def run_b():
        CheckSuite([stats, FingerprintCheck(cols=FP_COLS)]).run(
            spark, pages, "warc_day"
        ).unpersist()

    def run_c():
        CheckSuite([stats]).run(spark, pages, "warc_day").unpersist()
        partition_fingerprint(pages, "warc_day", FP_COLS).collect()

    out = {"n_pages": n, "reps": reps, "cores": cores, "fp_cols": FP_COLS}
    for key, fn in (("A_stats_only", run_a), ("B_fused_fp", run_b), ("C_two_pass", run_c)):
        fn()  # warmup
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            ts.append(round(time.monotonic() - t0, 3))
        out[key] = {"median_s": statistics.median(ts), "runs": ts}
    a, b, c = (out[k]["median_s"] for k in ("A_stats_only", "B_fused_fp", "C_two_pass"))
    out["fused_marginal_s"] = round(b - a, 3)
    out["two_pass_marginal_s"] = round(c - a, 3)
    out["saving_vs_two_pass_s"] = round(c - b, 3)
    with open("/root/repo/BENCH/AB_FINGERPRINT.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
