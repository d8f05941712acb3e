"""Isolate the cost components of partition_stats_pass at one core
count. Usage: spark-submit ... scripts/profile_stats.py <cores> <pages_parquet>
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
    spark = (
        SparkSession.builder.appName(f"dcs-pstats-{cores}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(pages_path).withColumn("warc_day", F.to_date("warc_ts"))
    part = F.col("warc_day").cast("string")
    t = {}

    def run(name, fn, warm=1):
        for _ in range(warm):
            fn()
        t0 = time.perf_counter()
        fn()
        t[name] = round(time.perf_counter() - t0, 2)

    run("scan_count_urls", lambda: df.filter(F.col("url").isNotNull()).count())
    run("scan_sum_len_text", lambda: df.groupBy(part.alias("p")).agg(
        F.sum(F.length("text"))).count())
    b = F.greatest(F.lit(0), F.least(F.lit(49), F.floor((F.length("text").cast("double")) / F.lit(100.0)).cast("int")))
    run("hist50_countif", lambda: df.select(part.alias("p"), b.alias("b")).groupBy("p").agg(
        F.array(*[F.count_if(F.col("b") == i) for i in range(50)])).count())
    run("hist_groupby2", lambda: df.groupBy(part.alias("p"), b.alias("b")).agg(
        F.count(F.lit(1))).count())
    run("regexp_count_tokens", lambda: df.groupBy(part.alias("p")).agg(
        F.avg(F.regexp_count("text", F.lit(r"\S+")))).count())
    run("split_size_tokens", lambda: df.groupBy(part.alias("p")).agg(
        F.avg(F.size(F.split(F.trim("text"), r"\s+")))).count())
    run("space_count_tokens", lambda: df.groupBy(part.alias("p")).agg(
        F.avg(F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1)).count())
    run("hll_lang", lambda: df.groupBy(part.alias("p")).agg(
        F.approx_count_distinct("lang")).count())
    from data_check_spark.operators.stats import partition_stats_pass
    th = {
        "text": {"max_null_rate": 0.05, "min_rows": 1, "min_avg_tokens": 3},
        "lang": {"max_null_rate": 0.05, "min_distinct": 2},
        "url": {"max_null_rate": 0.0},
    }
    nums = {"text_length": (F.length("text"), 0.0, 5000.0, 50)}
    run("full_stats_pass", lambda: partition_stats_pass(df, part, th, True, nums).count())
    print(json.dumps({"cores": cores, "timings": t}))
    spark.stop()


if __name__ == "__main__":
    main()
