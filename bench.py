"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Each query is forced with a noop-format write (full computation, no
driver collect overhead). ``pages_suite`` is the north-rule headline:
the full validation CheckSuite over a synthesized web-pages table
(PAGES_N rows, deterministic) — its docs/sec is reported separately.
Scaling evidence (local[8] vs local[32]) lives in
scripts/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from data_check_spark.session import get_spark

HEADLINE = [
    "pk_census",
    "column_match_ratios",
    "row_diff",
    "unique_violations",
    "refint_violations",
    "stats_documents",
    "psi_lang",
    "ks_nchars",
    "dedup_exact",
    "minhash_pairs",
    "knn_bruteforce",
    "token_stats",
    "quality_scores",
    "langid",
    "fingerprint",
    "events_hourly",
    "tpch_q1",
    "window_topk_orders",
]

PAGES_N = int(os.environ.get("DCS_BENCH_PAGES_N", "500000"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_pages_suite(spark, n: int) -> float:
    """Full validation suite over a synthesized pages table → seconds.

    The synthetic table is materialized to parquet OUTSIDE the timed
    region: the suite makes several passes over its input, and timing
    it over the raw generator relation re-pays the synthesis
    expressions (xxhash/repeat/sha2 per row) once per pass — measuring
    the generator, not the engine. Scanning parquet is also what the
    north rule describes (validation over an Iceberg/parquet table)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_check_spark.runner import default_pages_suite
    from data_check_spark.sources.synth import synth_pages, synth_pages_v2

    tmp = tempfile.mkdtemp(prefix="dcs_bench_pages_")
    try:
        synth_pages(spark, n).write.mode("overwrite").parquet(f"{tmp}/pages")
        synth_pages_v2(spark, n).write.mode("overwrite").parquet(f"{tmp}/pages_v2")
        df = spark.read.parquet(f"{tmp}/pages").withColumn(
            "warc_day", F.to_date("warc_ts")
        )
        ref = spark.read.parquet(f"{tmp}/pages_v2")
        suite = default_pages_suite(with_drift=True)
        t0 = time.perf_counter()
        res = suite.run(spark, df, "warc_day", reference_df=ref)
        _force(res.verdicts)
        for v in res.violations.values():
            _force(v)
        sec = time.perf_counter() - t0
        res.unpersist()
        return sec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("dcs-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    suite_sec = run_pages_suite(spark, PAGES_N)
    timings["pages_suite"] = round(suite_sec, 3)
    total += suite_sec
    docs_per_sec = round(PAGES_N / suite_sec, 1)

    print(
        json.dumps(
            {
                "metric": "headline queries + validation-suite throughput",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "pages_n": PAGES_N,
                "docs_per_sec": docs_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
