"""Discriminate WHY the composed verdicts plan is ~6x slower than the
sum of its parts. Usage: spark-submit ... scripts/profile_verdicts.py <cores> <pages> <v2>
"""
from __future__ import annotations

import json
import sys
import time

from pyspark import StorageLevel
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    v2_path = sys.argv[3]
    spark = (
        SparkSession.builder.appName(f"dcs-pv-{cores}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_check_spark.operators.stats import partition_stats_pass
    from data_check_spark.runner import default_pages_suite

    df = spark.read.parquet(pages_path).withColumn("warc_day", F.to_date("warc_ts"))
    ref = spark.read.parquet(v2_path)
    part_s = F.col("warc_day").cast("string")
    th = {
        "text": {"max_null_rate": 0.05, "min_rows": 1, "min_avg_tokens": 3},
        "lang": {"max_null_rate": 0.05, "min_distinct": 2},
        "url": {"max_null_rate": 0.0},
    }
    nums = {"text_length": (F.length("text"), 0.0, 5000.0, 50)}
    t = {}

    def tm(name, fn):
        t0 = time.perf_counter()
        fn()
        t[name] = round(time.perf_counter() - t0, 2)
        print(json.dumps({name: t[name]}), flush=True)

    tm("warm_scan", lambda: df.count())
    tm("n_days", lambda: print("days:", df.select(part_s).distinct().count()))
    tm("a_pass_count", lambda: partition_stats_pass(df, part_s, th, True, nums).count())
    p = partition_stats_pass(df, part_s, th, True, nums).persist(StorageLevel.MEMORY_AND_DISK)
    tm("b_pass_persist_count", lambda: p.count())
    p.unpersist()
    spark.catalog.clearCache()
    tm("c_pass_count_again", lambda: partition_stats_pass(df, part_s, th, True, nums).count())

    suite = default_pages_suite(with_drift=True)
    res = suite.run(spark, df, "warc_day", reference_df=ref)
    tm("d_verdicts_count", lambda: res.verdicts.count())
    tm("e_verdicts_write_again", lambda: res.verdicts.write.format("noop").mode("overwrite").save())
    res.unpersist()
    spark.catalog.clearCache()
    tm("f_pass_after_suite", lambda: partition_stats_pass(df, part_s, th, True, nums).count())
    print(json.dumps({"cores": cores, "timings": t}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
