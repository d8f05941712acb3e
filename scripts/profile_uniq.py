"""Micro-profile of the uniqueness/refint phase — which sub-step is
parallelism-independent?  spark-submit --master local[N] --py-files
build/dcs.zip scripts/profile_uniq.py <cores> <pages_parquet>
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
        SparkSession.builder.appName(f"dcs-uniqprof-{cores}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_check_spark.sources.synth import domain_of, synth_domains

    df = spark.read.parquet(pages_path).withColumn("warc_day", F.to_date("warc_ts"))
    part_s = F.col("warc_day").cast("string")
    timings = {}

    def run(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # warmup scan
    df.select(F.count("url")).collect()

    run("scan_url_only", lambda: df.select(F.count("url")).collect())
    run("scan_plus_dayproj", lambda: df.select(part_s.alias("p"), "url").select(F.count("url")).collect())
    keyed = df.groupBy(part_s.alias("partition"), F.col("url")).agg(F.count(F.lit(1)).alias("n"))
    run("keyed_count", lambda: keyed.select(F.count(F.lit(1))).collect())
    run("keyed_count_again", lambda: keyed.select(F.count(F.lit(1))).collect())
    run("dup_filter_count", lambda: keyed.filter(F.col("n") > 1).count())
    run("dim_build_broadcast", lambda: synth_domains(spark).select("domain").dropDuplicates().count())
    dim_keys = F.broadcast(synth_domains(spark).select(F.col("domain").alias("_dk")).dropDuplicates())
    slim = keyed.select("partition", domain_of(F.col("url")).alias("ref_key"), "n")
    missing = slim.join(dim_keys, slim["ref_key"] == dim_keys["_dk"], "left_anti")
    run("full_combo", lambda: missing.groupBy("partition", "ref_key").agg(F.sum("n")).count())
    # no-partial-agg variant: skip map-side combine (high-card keys make it useless)
    spark.conf.set("spark.sql.aggregate.partialaggregate.skip.enabled", "true")
    run("keyed_count_noskew", lambda: keyed.select(F.count(F.lit(1))).collect())

    print(json.dumps({"cores": cores, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
