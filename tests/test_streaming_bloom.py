"""Streaming bloom referential gate: twin-equality with the batch
gate, verdict arithmetic vs batch recomputation, violations stream."""

import pyspark.sql.functions as F
import pytest

from data_check_spark.operators.bloom import (
    build_key_bloom,
    bloom_member_probe,
)
from data_check_spark.sources.synth import synth_domains, synth_pages
from data_check_spark.streaming.checks import (
    run_to_memory,
    stream_pages,
    streaming_refint_bloom,
)

N = 2000


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_bloom_stream"))
    synth_pages(spark, N).withColumn("html", F.col("html").cast("string")) \
        .repartition(4).write.mode("overwrite").parquet(d)
    return d


@pytest.fixture(scope="module")
def url_bloom(spark, pages_dir):
    # dimension snapshot: urls of the first ~80% of rows (by row id
    # embedded in the url) — the rest are violations
    batch = spark.read.parquet(pages_dir)
    dim = batch.filter(F.xxhash64("url") % 5 != 0).select("url")
    return build_key_bloom(dim, "url", fpp=1e-4), dim


def test_streaming_violations_twin_batch(spark, pages_dir, url_bloom):
    """emit='violations' flags EXACTLY the keys the batch probe flags
    (fixed-seed determinism: same bitmap, same rows, same set)."""
    bloom, _dim = url_bloom
    stream = stream_pages(spark, pages_dir)
    q = run_to_memory(
        streaming_refint_bloom(stream, bloom, emit="violations"),
        "bloom_viol_rows",
    )
    q.awaitTermination(120)
    got = sorted(
        r["url"] for r in spark.table("bloom_viol_rows").select("url").collect()
    )
    batch = spark.read.parquet(pages_dir)
    member = bloom_member_probe(spark, bloom)
    want = sorted(
        r["url"]
        for r in batch.filter(~member(F.col("url"))).select("url").collect()
    )
    assert got == want and len(got) > 0


def test_streaming_verdicts_match_batch_counts(spark, pages_dir, url_bloom):
    bloom, _dim = url_bloom
    stream = stream_pages(spark, pages_dir)
    q = run_to_memory(
        streaming_refint_bloom(stream, bloom, window="1 day", max_violation_rows=5),
        "bloom_verdicts",
        "complete",
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: r for r in spark.table("bloom_verdicts").collect()
    }
    assert got
    batch = spark.read.parquet(pages_dir)
    member = bloom_member_probe(spark, bloom)
    want = {
        r["w"]["start"]: r
        for r in batch.groupBy(F.window("warc_ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(~member(F.col("url"))).alias("n_violations"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for start, w in want.items():
        g = got[start]
        assert (g["n_rows"], g["n_violations"]) == (w["n_rows"], w["n_violations"])
        assert g["passed"] == (w["n_violations"] <= 5)


def test_streaming_bloom_invalid_emit(spark, pages_dir, url_bloom):
    bloom, _dim = url_bloom
    stream = stream_pages(spark, pages_dir)
    with pytest.raises(ValueError, match="emit"):
        streaming_refint_bloom(stream, bloom, emit="bogus")
