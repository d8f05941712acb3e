"""operators/export: deterministic shard export — assignment
stability across parallelism/re-runs, the disk round-trip manifest
proof, corruption detection, and the NULL-key contract."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.export import (
    export_shards,
    shard_id,
    shard_manifest,
    verify_export,
)


def _docs(spark, n=200, parts=4):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text body "), F.col("id")).alias("text"),
        )
        .repartition(parts)
    )


def test_assignment_deterministic_and_partitioning_independent(spark):
    a = {
        r["doc_id"]: r["s"]
        for r in _docs(spark, parts=1)
        .select("doc_id", shard_id(F.col("doc_id"), 8).alias("s"))
        .collect()
    }
    b = {
        r["doc_id"]: r["s"]
        for r in _docs(spark, parts=16)
        .select("doc_id", shard_id(F.col("doc_id"), 8).alias("s"))
        .collect()
    }
    assert a == b
    assert set(a.values()) == set(range(8))  # all shards populated at n=200


def test_export_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _docs(spark)
    manifest = export_shards(df, out, "doc_id", 4)  # verify=True inside
    # layout: shard=K dirs, hidden _manifest
    assert sorted(
        os.path.basename(p) for p in glob.glob(out + "/shard=*")
    ) == [f"shard={k}" for k in range(4)]
    stored = spark.read.parquet(out + "/_manifest")
    assert {r["shard"]: r["n_rows"] for r in stored.collect()} == {
        r["shard"]: r["n_rows"] for r in manifest.collect()
    }
    # _manifest is underscore-hidden: reading the data dir sees only rows
    back = spark.read.parquet(out)
    assert back.count() == 200
    # reader-side audit passes on the intact export
    verify_export(spark, out, stored, ["doc_id", "text"])
    # rows landed in the shard the pure function says
    got = back.select(
        "doc_id", (F.col("shard") == shard_id(F.col("doc_id"), 4)).alias("ok")
    )
    assert got.filter(~F.col("ok")).count() == 0


def test_corruption_detected(spark, tmp_path):
    out = str(tmp_path / "shards")
    export_shards(_docs(spark), out, "doc_id", 4)
    stored = spark.read.parquet(out + "/_manifest")
    # drop one shard's data files — the reader-side audit must name it
    victim = glob.glob(out + "/shard=2/*.parquet")
    assert victim
    for p in victim:
        os.remove(p)
    with pytest.raises(RuntimeError, match="shards \\[2\\]"):
        verify_export(spark, out, stored, ["doc_id", "text"])


def test_manifest_matches_per_shard_recount(spark):
    df = _docs(spark)
    m = {r["shard"]: r["n_rows"] for r in shard_manifest(df, "doc_id", 4).collect()}
    counts = {
        r["s"]: r["n"]
        for r in df.select(shard_id(F.col("doc_id"), 4).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert m == counts and sum(m.values()) == 200


def test_bad_num_shards(spark):
    with pytest.raises(ValueError):
        shard_id(F.col("x"), 0)


def test_export_guards(spark, tmp_path):
    # pre-existing shard column would be silently destroyed -> reject
    clash = _docs(spark).withColumn("shard", F.lit(7))
    with pytest.raises(ValueError, match="'shard' column"):
        export_shards(clash, str(tmp_path / "a"), "doc_id", 4)
    # append would desync the stored manifest -> reject
    with pytest.raises(ValueError, match="append"):
        export_shards(_docs(spark), str(tmp_path / "b"), "doc_id", 4, mode="append")
    # NULL keys have no shard -> named error, not a false corruption report
    nulls = spark.createDataFrame(
        [(None, "x"), (1, "y")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="NULL 'doc_id' keys"):
        export_shards(nulls, str(tmp_path / "c"), "doc_id", 4)


def test_manifest_computed_once(spark, tmp_path):
    """The returned/stored manifest is a tiny local frame — using it
    (collect + write + verify) must not re-scan the source."""
    out = str(tmp_path / "shards")
    df = _docs(spark)
    manifest = export_shards(df, out, "doc_id", 4)
    plan = manifest._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "ExistingRDD" in plan
    stored = spark.read.parquet(out + "/_manifest")
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, manifest.collect())
    )
