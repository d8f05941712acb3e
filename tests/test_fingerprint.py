"""Partition fingerprints: order independence, injective encoding,
version-compare statuses, pruned diff equivalence, DuckDB parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.fingerprint import (
    changed_partitions,
    diff_changed_partitions,
    partition_fingerprint,
)
from data_check_spark.operators.rowdiff import row_diff


def _pages(spark, n=200):
    return spark.range(n).selectExpr(
        "concat('p', id % 5) AS part",
        "concat('https://ex.com/', id) AS url",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('text-', id % 31) END AS text",
        "CASE WHEN id % 3 = 0 THEN 'en' ELSE 'fr' END AS lang",
    )


def _fp_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fingerprint_is_order_and_partitioning_independent(spark):
    df = _pages(spark)
    base = _fp_rows(partition_fingerprint(df, "part"))
    shuffled = _fp_rows(
        partition_fingerprint(df.repartition(7).sortWithinPartitions("lang"), "part")
    )
    assert base == shuffled
    assert len(base) == 5 and all(r[1] == 40 for r in base)


def test_fingerprint_encoding_is_injective_on_separator_collisions(spark):
    # same concat bytes, different field boundaries / NULL-ness — the
    # length-prefix encoding must keep them apart
    rows = [("a|b", None), ("a", "b|"), ("a", None), ("N", "N"), (None, None)]
    df = spark.createDataFrame(rows, "c1 string, c2 string").withColumn(
        "part", F.lit("p")
    )
    fps = set()
    for r in rows:
        one = df.filter(
            F.col("c1").eqNullSafe(F.lit(r[0])) & F.col("c2").eqNullSafe(F.lit(r[1]))
        )
        fp = partition_fingerprint(one, "part", ["c1", "c2"]).collect()[0]
        fps.add((fp["fp_lo"], fp["fp_hi"]))
    assert len(fps) == len(rows)


def test_changed_partitions_statuses(spark):
    v1 = _pages(spark).filter("part <> 'p4'")           # p4 only in v2
    v2 = (
        _pages(spark)
        .filter("part <> 'p3'")                         # p3 only in v1
        .withColumn(
            "lang",
            F.when((F.col("part") == "p1") & (F.col("url").endswith("1")), "de")
            .otherwise(F.col("lang")),
        )
    )
    out = {r["partition"]: r for r in changed_partitions(v1, v2, "part").collect()}
    assert out["p3"]["status"] == "removed" and out["p3"]["n_rows_2"] is None
    assert out["p4"]["status"] == "added" and out["p4"]["n_rows_1"] is None
    assert out["p1"]["status"] == "changed"
    assert out["p0"]["status"] == "equal" and out["p2"]["status"] == "equal"


def test_diff_changed_partitions_matches_full_row_diff(spark):
    v1 = _pages(spark)
    v2 = _pages(spark).withColumn(
        "text",
        F.when(F.col("part") == "p2", F.concat(F.col("text"), F.lit("!")))
        .otherwise(F.col("text")),
    )
    pruned = diff_changed_partitions(v1, v2, "url", "part", ["text", "lang"])
    full = row_diff(v1, v2, "url", ["text", "lang"])
    assert _fp_rows(pruned) == _fp_rows(full)
    with pytest.raises(ValueError, match="partitions changed"):
        diff_changed_partitions(
            v1, v2.withColumn("lang", F.lit("zz")), "url", "part", max_changed=2
        )


def test_diff_includes_changed_null_partition(spark):
    """isin never matches NULL — a changed NULL-partition's rows must
    still reach the pruned diff via an explicit isNull predicate."""
    v1 = _pages(spark).withColumn(
        "part", F.when(F.col("url").endswith("0"), None).otherwise(F.col("part"))
    )
    v2 = v1.withColumn(
        "text",
        F.when(F.col("part").isNull(), F.concat(F.col("text"), F.lit("!")))
        .otherwise(F.col("text")),
    )
    pruned = diff_changed_partitions(v1, v2, "url", "part", ["text", "lang"])
    full = row_diff(v1, v2, "url", ["text", "lang"])
    assert _fp_rows(pruned) == _fp_rows(full)
    assert pruned.count() > 0  # the NULL partition's diffs are present


def test_fingerprint_plan_partial_agg_and_broadcast_compare(spark):
    df = _pages(spark)
    fp = partition_fingerprint(df, "part")
    fp.collect()
    plan = fp._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "partial_count" in plan, plan

    # the version compare is join-free (union + groupBy, pk-census style)
    cmp_ = changed_partitions(df, df.limit(150), "part")
    cmp_.collect()
    plan = cmp_._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "partial_max" in plan, plan


def test_changed_partitions_vs_audit(spark, tmp_path):
    from data_check_spark.operators.fingerprint import (
        changed_partitions_vs_audit,
        fingerprint_to_audit,
    )

    audit = str(tmp_path / "audit")
    v1 = _pages(spark)
    fingerprint_to_audit(v1, "part", audit, run_id="r1")
    v2 = v1.filter("part <> 'p3'").withColumn(
        "lang", F.when(F.col("part") == "p1", "de").otherwise(F.col("lang"))
    )
    out = {r["partition"]: r["status"] for r in
           changed_partitions_vs_audit(v2, "part", audit).collect()}
    assert out == {"p0": "equal", "p1": "changed", "p2": "equal",
                   "p3": "removed", "p4": "equal"}
    # a newer stored run becomes the default baseline; run_id pins r1
    fingerprint_to_audit(v2, "part", audit, run_id="r2")
    assert all(
        r["status"] == "equal"
        for r in changed_partitions_vs_audit(v2, "part", audit).collect()
    )
    pinned = {r["partition"]: r["status"] for r in
              changed_partitions_vs_audit(v2, "part", audit, run_id="r1").collect()}
    assert pinned["p1"] == "changed" and pinned["p3"] == "removed"


def test_fingerprint_duckdb_parity(spark):
    """The audit claim: any engine re-derives the same fingerprint."""
    df = _pages(spark, n=100)
    got = _fp_rows(partition_fingerprint(df, "part", ["url", "text", "lang"]))
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(
        """
        WITH h AS (
          SELECT part, md5(concat_ws('|',
            CASE WHEN url  IS NULL THEN 'N' ELSE CAST(length(url)  AS VARCHAR) || ':' || url  END,
            CASE WHEN text IS NULL THEN 'N' ELSE CAST(length(text) AS VARCHAR) || ':' || text END,
            CASE WHEN lang IS NULL THEN 'N' ELSE CAST(length(lang) AS VARCHAR) || ':' || lang END
          )) AS h FROM t)
        SELECT part, COUNT(*) AS n_rows,
               CAST(SUM(CAST(('0x' || substring(h, 1, 15)) AS BIGINT)) AS DECIMAL(38,0)) AS fp_lo,
               CAST(SUM(CAST(('0x' || substring(h, 16, 15)) AS BIGINT)) AS DECIMAL(38,0)) AS fp_hi
        FROM h GROUP BY part
        """
    ).fetchall()
    assert got == sorted(tuple(r) for r in exp)
