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


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _dedup_fn."""

    def __init__(self):
        self._val = None

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v


def test_dedup_state_bounded():
    """Three micro-batches through _dedup_fn: state must stay an
    append-only array of int64 hashes — O(distinct_urls * 8) bytes,
    never re-sorted, no url strings."""
    import pandas as pd

    from data_check_spark.streaming.checks import _dedup_fn

    def batch(urls, ts0):
        return pd.DataFrame(
            {
                "url": urls,
                # _uh stands in for the JVM-side xxhash64: any stable
                # int64 per url works for the unit contract
                "_uh": [hash(u) % (2**62) for u in urls],
                "warc_ts": pd.to_datetime([ts0] * len(urls)),
                "text": ["t"] * len(urls),
                "lang": ["en"] * len(urls),
            }
        )

    state = _FakeState()
    batches = [
        batch(["a", "b", "c"], "2024-01-01"),
        batch(["b", "d"], "2024-01-02"),          # b = repeat
        batch(["e", "a", "f", "e"], "2024-01-03"),  # a repeat, e in-batch dup
    ]
    firsts = []
    insertion_order = []
    for b in batches:
        out = list(_dedup_fn((0,), iter([b]), state))[0]
        firsts.extend(out["first_seen"].tolist())
        new = b.loc[out["first_seen"].values, "url"].tolist()
        insertion_order.extend(hash(u) % (2**62) for u in new)
        (arr,) = state.get
        # bounded: exactly one int64 per distinct url seen so far
        assert len(arr) == len(set(insertion_order))
        assert all(isinstance(h, int) for h in arr)
        # append-only in first-seen order — proves no per-batch re-sort
        assert list(arr) == insertion_order
    assert firsts == [True, True, True, False, True, True, False, True, False]


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
