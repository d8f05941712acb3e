import pyspark.sql.functions as F
import pytest

from data_check_spark.operators.sketch import (
    merge_sketch,
    partition_sketch,
    quantiles_via_sketch,
    sketch_quantiles,
)


def test_sketch_quantiles_accuracy(spark):
    df = spark.range(0, 10000).select(F.col("id").cast("double").alias("v"))
    out = {r["q"]: r["value"] for r in
           quantiles_via_sketch(df, "v", 0, 10000, [0.1, 0.5, 0.9], n_bins=512).collect()}
    assert out[0.5] == pytest.approx(5000, abs=10000 / 512 + 1)
    assert out[0.1] == pytest.approx(1000, abs=10000 / 512 + 1)
    assert out[0.9] == pytest.approx(9000, abs=10000 / 512 + 1)


def test_sketch_merge_is_partition_independent(spark):
    a = spark.range(0, 5000, 1, 2).select(F.col("id").cast("double").alias("v"))
    b = spark.range(0, 5000, 1, 17).select(F.col("id").cast("double").alias("v"))
    sa = merge_sketch(partition_sketch(a, "v", 0, 5000, 128)).orderBy("center").collect()
    sb = merge_sketch(partition_sketch(b, "v", 0, 5000, 128)).orderBy("center").collect()
    assert [(r["center"], r["weight"]) for r in sa] == [(r["center"], r["weight"]) for r in sb]


def test_sketch_merge_across_tables(spark):
    """Sketches persisted from separate runs merge without rescans."""
    a = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    b = spark.range(1000, 2000).select(F.col("id").cast("double").alias("v"))
    s = merge_sketch(
        partition_sketch(a, "v", 0, 2000, 256).unionByName(
            partition_sketch(b, "v", 0, 2000, 256)
        )
    )
    out = {r["q"]: r["value"] for r in sketch_quantiles(s, [0.5]).collect()}
    assert out[0.5] == pytest.approx(1000, abs=2000 / 256 + 1)


def test_sketch_empty_and_nulls(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    out = quantiles_via_sketch(df, "v", 0, 10, [0.5]).collect()
    assert out[0]["value"] is None


def test_hll_sketches_union_matches_direct_and_bounds(spark):
    """Union of per-partition sketches == one direct global sketch
    (estimate-identical), and estimates stay within the lg_k=12
    ~5% bound of exact."""
    from data_check_spark.operators.sketch import (
        hll_estimates,
        hll_merge,
        hll_partition_sketches,
    )

    df = spark.range(50_000).selectExpr(
        "cast(id % 7 as string) AS part",
        "cast(id % 9123 as string) AS k",
        "cast(id as string) AS uid",
    )
    sk = hll_partition_sketches(df, "part", ["k", "uid"])
    est = {r["column"]: r["n_distinct_est"]
           for r in hll_estimates(sk, per_partition=False).collect()}
    assert abs(est["k"] - 9123) / 9123 < 0.05
    assert abs(est["uid"] - 50_000) / 50_000 < 0.05
    # direct global sketch: also within bound (NOT necessarily equal —
    # a never-merged sketch estimates via HIP, a union via composite)
    direct = {r["column"]: r["n_distinct_est"] for r in hll_estimates(
        hll_partition_sketches(df.selectExpr("'*' AS g", "k", "uid"), "g", ["k", "uid"]),
        per_partition=False).collect()}
    assert abs(direct["k"] - 9123) / 9123 < 0.05
    assert abs(direct["uid"] - 50_000) / 50_000 < 0.05
    # partitioning-independence of the union estimate
    re7 = {r["column"]: r["n_distinct_est"] for r in hll_estimates(
        hll_partition_sketches(df.repartition(13), "part", ["k", "uid"]),
        per_partition=False).collect()}
    assert est == re7


def test_hll_sketches_canonical_domain(spark):
    """Array values sketch in their CANONICAL string domain: ['a','b']
    and ['b','a'] are one value, matching what column_stats'
    distinct paths count — not the raw cast's render order."""
    from data_check_spark.operators.sketch import hll_estimates, hll_partition_sketches

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b", "a"]), (3, ["c"])],
        "id long, tags array<string>",
    ).selectExpr("'*' AS part", "tags")
    est = hll_estimates(
        hll_partition_sketches(df, "part", ["tags"]), per_partition=False
    ).collect()[0]["n_distinct_est"]
    assert est == 2  # {a,b} once + {c}; a plain cast would count 3


def test_hll_incremental_merge_without_rescan(spark, tmp_path):
    """The audit story: run 1 sketches partitions A,B; run 2 sketches
    only C and unions with the STORED rows — the combined estimate
    matches sketching all three at once."""
    from data_check_spark.operators.sketch import (
        hll_estimates,
        hll_merge,
        hll_partition_sketches,
    )
    from data_check_spark.plans.audit import write_audit

    df = spark.range(30_000).selectExpr(
        "cast(id % 3 as string) AS part", "cast(id % 4567 as string) AS k"
    )
    audit = str(tmp_path / "audit")
    write_audit(
        hll_partition_sketches(df.filter("part <> '2'"), "part", ["k"]),
        audit, run_id="r1", kind="hll",
    )
    stored = (
        spark.read.parquet(audit)
        .filter("audit_kind = 'hll'")
        .select("partition", "column", "sketch", "n_rows")
    )
    merged = hll_merge(stored, hll_partition_sketches(df.filter("part = '2'"), "part", ["k"]))
    got = hll_estimates(merged, per_partition=False).collect()[0]["n_distinct_est"]
    want = hll_estimates(
        hll_partition_sketches(df, "part", ["k"]), per_partition=False
    ).collect()[0]["n_distinct_est"]
    assert got == want
    assert merged.agg({"n_rows": "sum"}).collect()[0][0] == 30_000
