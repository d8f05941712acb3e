"""Per-phase wall-clock profile of the pages validation suite — used
to locate parallelism-independent fixed costs that cap single-box
scaling efficiency (T = F + W/cores; F shows up as the phase whose
time doesn't shrink 8→32 cores).

Usage:
    spark-submit --master local[N] --py-files build/dcs.zip \
        scripts/profile_suite.py <cores> <pages_parquet> <v2_parquet>
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
        SparkSession.builder.appName(f"dcs-profile-{cores}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark import StorageLevel

    from data_check_spark.operators.drift import drift_profile, psi_from_profiles
    from data_check_spark.operators.stats import (
        numeric_profiles_from_pass,
        partition_stats_pass,
        verdicts_from_pass,
    )
    from data_check_spark.runner import default_pages_suite, domain_of, synth_domains

    df = spark.read.parquet(pages_path).withColumn("warc_day", F.to_date("warc_ts"))
    ref = spark.read.parquet(v2_path)
    part_s = F.col("warc_day").cast("string")

    suite = default_pages_suite(with_drift=True)
    timings: dict[str, float] = {}

    def t(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)

        return _T()

    # warmup: full suite once (JIT, page cache)
    res = suite.run(spark, df, "warc_day", reference_df=ref)
    res.verdicts.write.format("noop").mode("overwrite").save()
    for v in res.violations.values():
        v.write.format("noop").mode("overwrite").save()
    res.unpersist()
    spark.catalog.clearCache()
    time.sleep(2)

    thresholds = {
        "text": {"max_null_rate": 0.05, "min_rows": 1, "min_avg_tokens": 3},
        "lang": {"max_null_rate": 0.05, "min_distinct": 2},
        "url": {"max_null_rate": 0.0},
    }
    nums = {"text_length": (F.length("text"), 0.0, 5000.0, 50)}

    with t("total"):
        with t("stats_pass_df"):
            pass_df = partition_stats_pass(df, part_s, thresholds, True, nums).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            pass_df.count()
        cats = {"lang": F.col("lang")}
        with t("ref_scan_profile"):
            prof2 = drift_profile(ref, cats, nums).persist(StorageLevel.MEMORY_AND_DISK)
            prof2.count()
        with t("df_cat_scan_plus_psi"):
            prof1 = numeric_profiles_from_pass(pass_df, nums).unionByName(
                drift_profile(df, cats, {})
            )
            psi = psi_from_profiles(prof1, prof2)
            psi.count()
        with t("uniq_refint_shuffle"):
            keyed = df.groupBy(part_s.alias("partition"), F.col("url")).agg(
                F.count(F.lit(1)).alias("n")
            )
            dup_branch = keyed.filter(F.col("n") > 1).select(
                "partition", F.col("url").cast("string").alias("key"), "n",
                F.lit("unique:url").alias("kind"),
            )
            dim_keys = F.broadcast(
                synth_domains(spark).select(F.col("domain").alias("_dk")).dropDuplicates()
            )
            slim = keyed.select("partition", domain_of(F.col("url")).alias("ref_key"), "n")
            missing = slim.join(dim_keys, slim["ref_key"] == dim_keys["_dk"], "left_anti")
            ref_branch = (
                missing.groupBy("partition", "ref_key")
                .agg(F.sum("n").alias("n"))
                .select(
                    "partition", F.col("ref_key").cast("string").alias("key"), "n",
                    F.lit("refint:domain_in_snapshot").alias("kind"),
                )
            )
            combo = dup_branch.unionByName(ref_branch).persist(StorageLevel.MEMORY_AND_DISK)
            combo.count()
        with t("verdict_assembly"):
            v = verdicts_from_pass(pass_df, thresholds)
            v.write.format("noop").mode("overwrite").save()
        with t("cat_drift_scan_only"):
            drift_profile(df, {"lang": F.col("lang")}, {}).count()
        with t("full_suite_run"):
            res = suite.run(spark, df, "warc_day", reference_df=ref)
            res.verdicts.write.format("noop").mode("overwrite").save()
            for vv in res.violations.values():
                vv.write.format("noop").mode("overwrite").save()
            res.unpersist()

    print(json.dumps({"cores": cores, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
