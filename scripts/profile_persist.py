"""Pin down why persisting the stats-pass frame is ~70x slower than
computing it, and evaluate alternatives.
Usage: spark-submit ... scripts/profile_persist.py <cores> <pages>
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
    spark = (
        SparkSession.builder.appName(f"dcs-pp-{cores}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_check_spark.operators.stats import partition_stats_pass

    df = spark.read.parquet(pages_path).withColumn("warc_day", F.to_date("warc_ts"))
    part_s = F.col("warc_day").cast("string")
    th_full = {
        "text": {"max_null_rate": 0.05, "min_rows": 1, "min_avg_tokens": 3},
        "lang": {"max_null_rate": 0.05, "min_distinct": 2},
        "url": {"max_null_rate": 0.0},
    }
    th_notok = {
        "text": {"max_null_rate": 0.05, "min_rows": 1},
        "lang": {"max_null_rate": 0.05, "min_distinct": 2},
        "url": {"max_null_rate": 0.0},
    }
    th_nohll = {
        "text": {"max_null_rate": 0.05, "min_rows": 1},
        "lang": {"max_null_rate": 0.05},
        "url": {"max_null_rate": 0.0},
    }
    nums = {"text_length": (F.length("text"), 0.0, 5000.0, 50)}
    df.count()

    def tm(name, fn):
        t0 = time.perf_counter()
        fn()
        dt = round(time.perf_counter() - t0, 2)
        print(json.dumps({name: dt}), flush=True)
        spark.catalog.clearCache()

    def persisted(th, n):
        p = partition_stats_pass(df, part_s, th, True, n).persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        return p

    tm("plain_count", lambda: partition_stats_pass(df, part_s, th_full, True, nums).count())
    tm("persist_full", lambda: persisted(th_full, nums))
    tm("persist_no_tokens", lambda: persisted(th_notok, nums))
    tm("persist_no_hist", lambda: persisted(th_full, {}))
    tm("persist_no_tok_no_hist", lambda: persisted(th_notok, {}))
    tm("persist_no_hll", lambda: persisted(th_nohll, {}))
    tm("local_checkpoint", lambda: partition_stats_pass(df, part_s, th_full, True, nums)
       .localCheckpoint(eager=True).count())
    def collect_recreate():
        src = partition_stats_pass(df, part_s, th_full, True, nums)
        rows = src.collect()
        spark.createDataFrame(rows, src.schema).count()
    tm("collect_recreate", collect_recreate)
    spark.stop()


if __name__ == "__main__":
    main()
