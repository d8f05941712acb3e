"""Compare uniqueness-aggregation designs at one core count:
full-url groupBy vs xxhash64-keyed groupBy (+verification join) vs
domain-only refint groupBy.
Usage: spark-submit ... scripts/profile_uniq2.py <cores> <pages>
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
        SparkSession.builder.appName(f"dcs-uq2-{cores}")
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
    df.select(F.count("url")).collect()

    def tm(name, fn):
        t0 = time.perf_counter()
        fn()
        print(json.dumps({name: round(time.perf_counter() - t0, 2)}), flush=True)

    # A: current design — groupBy(partition, url) full string keys
    keyed = df.groupBy(part_s.alias("partition"), F.col("url")).agg(
        F.count(F.lit(1)).alias("n"))
    tm("A_url_groupby", lambda: keyed.filter(F.col("n") > 1).count())

    # B: hash-keyed — shuffle (partition, hash64) only, then verify
    h = F.xxhash64("url")
    cand = (df.groupBy(part_s.alias("partition"), h.alias("_h"))
            .agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1))

    def run_b():
        c = cand.select("partition", "_h")
        dup_rows = df.select(part_s.alias("partition"), "url", h.alias("_h")).join(
            F.broadcast(c), ["partition", "_h"], "left_semi")
        dups = dup_rows.groupBy("partition", "url").agg(
            F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
        dups.count()
    tm("B_hash_groupby_verify", run_b)

    # C: hash-keyed without partition col in the key
    cand2 = (df.groupBy(h.alias("_h")).agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") > 1))
    tm("C_hash_only_groupby", lambda: cand2.count())

    # D: refint standalone — domain groupBy, map-side combine collapses
    dim_keys = F.broadcast(synth_domains(spark).select(F.col("domain").alias("_dk")).dropDuplicates())
    dom = df.groupBy(part_s.alias("partition"), domain_of(F.col("url")).alias("ref_key")).agg(
        F.count(F.lit(1)).alias("n"))
    tm("D_domain_groupby_anti", lambda: dom.join(
        dim_keys, dom["ref_key"] == dim_keys["_dk"], "left_anti").count())
    spark.stop()


if __name__ == "__main__":
    main()
