"""Stats-pass variant matrix: full pass vs no-HLL vs sampled tokens.
Prints plan head (aggregate operator kind) + timed collect.
Usage: spark-submit ... scripts/profile_passvariants.py <cores> <pages>
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
        SparkSession.builder.appName(f"dcs-pv-{cores}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_check_spark.operators.stats import partition_stats_pass

    df = spark.read.parquet(pages_path).withColumn("warc_day", F.to_date("warc_ts"))
    part = F.col("warc_day").cast("string")
    th_full = {
        "text": {"max_null_rate": 0.05, "min_rows": 1, "min_avg_tokens": 3},
        "lang": {"max_null_rate": 0.05, "min_distinct": 2},
        "url": {"max_null_rate": 0.0},
    }
    th_nodist = {
        "text": {"max_null_rate": 0.05, "min_rows": 1, "min_avg_tokens": 3},
        "lang": {"max_null_rate": 0.05},
        "url": {"max_null_rate": 0.0},
    }
    nums = {"text_length": (F.length("text"), 0.0, 5000.0, 50)}
    df.count()

    def tm(name, frame):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        aggkind = "objecthash" if "ObjectHashAggregate" in plan else (
            "sortagg" if "SortAggregate" in plan else "hashagg")
        wsc = plan.count("WholeStageCodegen")
        t0 = time.perf_counter()
        frame.collect()
        print(json.dumps({name: round(time.perf_counter() - t0, 2),
                          "agg": aggkind, "wsc_spans": wsc}), flush=True)

    tm("full_pass", partition_stats_pass(df, part, th_full, True, nums))
    tm("pass_no_hll", partition_stats_pass(df, part, th_nodist, True, nums))
    # distinct via codegen 2-key groupBy (low-card col)
    tm("lang_distinct_2key", df.groupBy(part.alias("p"), "lang").agg(
        F.count(F.lit(1))).groupBy("p").agg(F.count(F.lit(1))))
    # sampled tokens: deterministic 1/16 hash sample of rows
    c = F.col("text")
    trimmed = F.trim(c)
    tok = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.length(trimmed) - F.length(F.replace(trimmed, F.lit(" "), F.lit(""))) + F.lit(1))
    samp = F.pmod(F.xxhash64("url"), F.lit(16)) == 0
    tm("tokens_sampled_16", df.groupBy(part.alias("p")).agg(
        F.avg(F.when(samp, tok)).alias("avg_tokens")))
    tm("tokens_unsampled", df.groupBy(part.alias("p")).agg(F.avg(tok).alias("avg_tokens")))
    spark.stop()


if __name__ == "__main__":
    main()
