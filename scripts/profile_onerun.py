"""Time the sub-steps of scaling_worker.one_run to find where the
suite's wall-clock actually goes. Mirrors scaling_worker's config.
Usage: spark-submit ... scripts/profile_onerun.py <cores> <pages> <v2>
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
        SparkSession.builder.appName(f"dcs-onerun-{cores}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.cleaner.periodicGC.interval", "15s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_check_spark.runner import default_pages_suite

    df = spark.read.parquet(pages_path).withColumn("warc_day", F.to_date("warc_ts"))
    ref = spark.read.parquet(v2_path)
    df.count()
    suite = default_pages_suite(with_drift=True)

    def one_run(tag: str) -> dict:
        t = {}
        t0 = time.perf_counter()
        res = suite.run(spark, df, "warc_day", reference_df=ref)
        t["suite_run_call"] = round(time.perf_counter() - t0, 2)
        # materialize violation persists FIRST so verdicts_write times
        # only the drift/psi/assembly remainder
        for name, v in res.violations.items():
            t2 = time.perf_counter()
            v.write.format("noop").mode("overwrite").save()
            t[f"viol:{name}"] = round(time.perf_counter() - t2, 2)
        t1 = time.perf_counter()
        res.verdicts.write.format("noop").mode("overwrite").save()
        t["verdicts_write"] = round(time.perf_counter() - t1, 2)
        t["total"] = round(time.perf_counter() - t0, 2)
        print(json.dumps({"tag": tag, "cores": cores, "t": t}), flush=True)
        return t

    one_run("warmup")
    for i in range(3):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(2)
        one_run(f"run{i}")
    spark.stop()


if __name__ == "__main__":
    main()
