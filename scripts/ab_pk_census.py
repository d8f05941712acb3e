"""A/B: pk_census plan shapes — union+groupBy (shipped,
operators/rowdiff.py:64-115) vs the reference-shaped FULL OUTER JOIN
census (``/root/reference/data_check/processors/bigquery.py:55-92``) —
on the same inputs, alternating runs, median of N, with the
bench-protocol cpu-ceiling probes around the timed block.

Inputs:
  * sf0.1 orders versions (the bench's pk_census input), and
  * two 20M-row synthesized pages tables keyed on url (the web-scale
    shape; reuses build/pages_*.parquet when present).

Usage: python scripts/ab_pk_census.py [n_pages] [reps]
Prints one JSON line per input with per-variant medians + ceilings.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F

from bench_scaling import cpu_ceiling, materialize
from data_check_spark.operators.rowdiff import pk_census
from data_check_spark.session import get_spark


def pk_census_join(df1, df2, pk):
    """Reference-shaped variant: FULL OUTER JOIN USING(pk) + COUNTIF
    battery (one SMJ/shuffled-hash join of both key columns)."""
    a = df1.select(F.col(pk).alias("_k1"))
    b = df2.select(F.col(pk).alias("_k2"))
    j = a.join(b, a["_k1"] == b["_k2"], "full_outer")
    total = F.count(F.lit(1))
    miss1 = F.count_if(F.col("_k1").isNull())
    miss2 = F.count_if(F.col("_k2").isNull())
    return j.agg(
        total.alias("total_rows"),
        miss1.alias("missing_primary_keys_table1"),
        miss2.alias("missing_primary_keys_table2"),
        F.round(F.try_divide(miss1.cast("double"), total.cast("double")), 6).alias(
            "missing_primary_keys_table1_ratio"
        ),
        F.round(F.try_divide(miss2.cast("double"), total.cast("double")), 6).alias(
            "missing_primary_keys_table2_ratio"
        ),
    )


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def ab(spark, name, df1, df2, pk, reps):
    variants = {"union_groupby": pk_census, "full_outer_join": pk_census_join}
    # warmup both
    for fn in variants.values():
        _force(fn(df1, df2, pk))
    times = {v: [] for v in variants}
    for _ in range(reps):
        for v, fn in variants.items():  # alternate A/B within each rep
            t0 = time.perf_counter()
            _force(fn(df1, df2, pk))
            times[v].append(round(time.perf_counter() - t0, 3))
    out = {
        "input": name,
        "medians": {v: round(statistics.median(ts), 3) for v, ts in times.items()},
        "all_runs": times,
    }
    # sanity: identical answers
    r1 = pk_census(df1, df2, pk).collect()[0].asDict()
    r2 = pk_census_join(df1, df2, pk).collect()[0].asDict()
    out["answers_match"] = r1 == r2
    return out


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-pkcensus", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    c_pre = cpu_ceiling(8, 32)
    t1, t2 = entry._orders_versions(spark, "/root/testdata/sf0.1")
    res_orders = ab(spark, "orders_sf0.1", t1, t2, "o_orderkey", reps)
    print(json.dumps(res_orders), flush=True)

    build = os.path.join(REPO, "build")
    os.makedirs(build, exist_ok=True)
    p1, p2 = materialize(n_pages, build)
    pages1 = spark.read.parquet(p1)
    pages2 = spark.read.parquet(p2)
    res_pages = ab(spark, f"pages_{n_pages}", pages1, pages2, "url", reps)
    c_post = cpu_ceiling(8, 32)
    res_pages["ceiling_pre"] = round(c_pre, 3)
    res_pages["ceiling_post"] = round(c_post, 3)
    print(json.dumps(res_pages), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
