"""Structured-Streaming checks: windowed stat verdicts and stateful
url dedup, exercised with availableNow triggers over parquet file
sources, compared against their batch equivalents."""

import pyspark.sql.functions as F
import pytest

from data_check_spark.sources.synth import synth_pages
from data_check_spark.streaming.checks import (
    run_to_memory,
    stream_pages,
    streaming_dedup,
    streaming_stat_verdicts,
)

N = 2000


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    # html binary → string for the stream-schema (see PAGES_SCHEMA note)
    synth_pages(spark, N).withColumn("html", F.col("html").cast("string")) \
        .repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_streaming_stats_match_batch(spark, pages_dir):
    stream = stream_pages(spark, pages_dir)
    q = run_to_memory(
        streaming_stat_verdicts(stream, window="1 day"), "verdicts", "complete"
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: r for r in spark.table("verdicts").collect()
    }
    batch = (
        spark.read.parquet(pages_dir)
        .groupBy(F.window("warc_ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("text").isNull()).alias("null_text"),
        )
        .collect()
    )
    assert len(got) == len(batch) > 0
    for b in batch:
        g = got[b["w"]["start"]]
        assert g["n_rows"] == b["n_rows"]
        assert g["null_rate_text"] == pytest.approx(b["null_text"] / b["n_rows"], abs=1e-6)
        assert g["passed"] == (b["null_text"] / b["n_rows"] <= 0.05
                               and g["null_rate_lang"] <= 0.05)


def test_streaming_dedup(spark, pages_dir):
    stream = stream_pages(spark, pages_dir)
    q = run_to_memory(streaming_dedup(stream), "deduped", "append")
    q.awaitTermination(120)
    out = spark.table("deduped")
    total = out.count()
    assert total == N
    firsts = out.filter("first_seen").count()
    distinct_urls = spark.read.parquet(pages_dir).select("url").distinct().count()
    assert firsts == distinct_urls
    # every url marked first exactly once
    assert (
        out.filter("first_seen").groupBy("url").count().filter("count > 1").count() == 0
    )
