"""spark-submit worker for the scaling bench: runs the full web-pages
validation suite over a pre-materialized parquet table and prints one
JSON line {"cores": N, "docs": D, "suite_sec": S, "docs_per_sec": R}.

Invoked as:
    spark-submit --master local[N] --py-files build/dcs.zip \
        scripts/scaling_worker.py <cores> <pages_parquet> <pages_v2_parquet>

(the north rule's submission mode; --py-files ships the library the
way a real cluster submission would.)
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    v2_path = sys.argv[3]

    spark = (
        SparkSession.builder.appName(f"dcs-scaling-{cores}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 4 tasks per core and ≥8 waves per scan stage: with splits ==
        # cores the LAST task's tail is a full wave — at 4N cores a
        # 64-split input is only 2 waves and one straggler costs 50%
        # of the stage. Small splits + AQE coalescing amortize tails
        # identically at both parallelism levels (fair N vs 4N).
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        # one scan task per input FILE: the materialized input is 256
        # x ~8MB files, and the default 128MB (or even 64MB) split
        # size PACKS ~8 files into one task — measured scan_splits=35,
        # i.e. ONE wave at local[32], straggler-bound and
        # parallelism-flat (scripts/profile_passvariants.py: token
        # scan 29.2s@32 / 53.8s@8 = 0.46 efficiency packed vs
        # 19.3s@32 / 65.0s@8 = 0.84 with per-file splits). 8MB +
        # zero open-cost keeps all 256 splits at both core counts.
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # aggressively GC dereferenced RDDs/shuffles between timed runs —
        # otherwise stale shuffle files from earlier runs accumulate and
        # later runs slow down monotonically (observed 148→224 s drift)
        .config("spark.cleaner.periodicGC.interval", "15s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_check_spark.runner import default_pages_suite

    df = spark.read.parquet(pages_path).withColumn("warc_day", F.to_date("warc_ts"))
    ref = spark.read.parquet(v2_path)
    docs = df.count()
    suite = default_pages_suite(with_drift=True)

    def one_run() -> float:
        t0 = time.perf_counter()
        res = suite.run(spark, df, "warc_day", reference_df=ref)
        res.verdicts.write.format("noop").mode("overwrite").save()
        for v in res.violations.values():
            v.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    one_run()  # warmup: JIT + code cache + OS page cache, excluded
    # median of 3 timed runs — the sandbox VM shows heavy run-to-run
    # noise (shared host). Before each run, drop Spark-level caches the
    # previous run's persist() calls left behind: CacheManager matches
    # canonicalized plans, so a later run would silently reuse them and
    # skip the big shuffles it claims to measure.
    secs = []
    for _ in range(3):
        spark.catalog.clearCache()
        spark._jvm.System.gc()  # release dereferenced shuffle files now
        time.sleep(2)
        secs.append(one_run())
    secs.sort()
    sec = secs[1]
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": docs,
                "suite_sec": round(sec, 3),
                "all_runs_sec": [round(s, 3) for s in secs],
                "docs_per_sec": round(docs / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
