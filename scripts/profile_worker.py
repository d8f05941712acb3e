"""Per-check scaling profile: times each suite component separately.
spark-submit --master local[N] scripts/profile_worker.py N <pages> <v2>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cores, p1, p2 = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    spark = (
        SparkSession.builder.appName(f"dcs-profile-{cores}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_check_spark.operators.drift import psi_categorical, psi_numeric
    from data_check_spark.operators.stats import partition_stats_verdicts
    from data_check_spark.plans.suite import CheckSuite, ReferentialCheck, UniquenessCheck
    from data_check_spark.sources.synth import domain_of, synth_domains

    df = spark.read.parquet(p1).withColumn("warc_day", F.to_date("warc_ts"))
    ref = spark.read.parquet(p2)

    def force(d):
        d.write.format("noop").mode("overwrite").save()

    def timed(fn):
        fn()  # warmup
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 2)

    out = {"cores": cores}
    out["scan_only"] = timed(lambda: force(df.select(F.count("url"))))
    out["stats"] = timed(
        lambda: force(
            partition_stats_verdicts(
                df,
                F.col("warc_day").cast("string"),
                {
                    "text": {"max_null_rate": 0.05, "min_rows": 1},
                    "lang": {"max_null_rate": 0.05, "min_distinct": 2},
                    "url": {"max_null_rate": 0.0},
                },
            )
        )
    )
    uq = CheckSuite([UniquenessCheck(key="url")])
    out["unique"] = timed(lambda: force(uq.run(spark, df, "warc_day").verdicts))
    rf = CheckSuite(
        [
            ReferentialCheck(
                name="domain", fact_key=lambda: domain_of(F.col("url")),
                dim=synth_domains, dim_key="domain",
            )
        ]
    )
    out["refint"] = timed(lambda: force(rf.run(spark, df, "warc_day").verdicts))
    out["psi_lang"] = timed(lambda: force(psi_categorical(df, ref, "lang")))
    out["psi_len"] = timed(lambda: force(psi_numeric(df, ref, F.length("text"), 0, 5000, 50)))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
