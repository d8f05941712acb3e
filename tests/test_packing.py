"""Sequence packing: conservation invariants, budget compliance,
oversize flagging, FFD fill quality, and determinism at fixed shards."""

import random

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.packing import pack_sequences, pack_summary


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(9)
    rows = [(i, rng.randint(20, 900)) for i in range(3000)]
    rows += [(9001, 5000), (9002, 1001)]  # oversize at max_len=1000
    return spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")


def test_invariants(spark, docs):
    packed = pack_sequences(docs, "doc_id", "n_tokens", 1000, num_shards=4)
    summ = pack_summary(packed, 1000).collect()
    n_in = docs.count()
    assert packed.count() == n_in
    assert packed.select("doc_id").distinct().count() == n_in
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == docs.agg(
        F.sum("n_tokens")
    ).collect()[0][0]
    for r in summ:
        if r["oversize"]:
            assert r["n_docs"] == 1 and r["total_tokens"] > 1000
        else:
            assert r["total_tokens"] <= 1000
    assert sum(1 for r in summ if r["oversize"]) == 2


def test_fill_quality(spark, docs):
    """FFD over a uniform length mix should fill multi-doc packs well
    past the 0.9 contract floor."""
    packed = pack_sequences(
        docs.filter(F.col("n_tokens") <= 1000), "doc_id", "n_tokens", 1000, num_shards=4
    )
    summ = pack_summary(packed, 1000)
    mean_fill = summ.filter(F.col("n_docs") > 1).agg(F.avg("fill_ratio")).collect()[0][0]
    assert mean_fill >= 0.9, mean_fill


def test_deterministic_at_fixed_shards(spark, docs):
    a = sorted(map(tuple, pack_sequences(docs, "doc_id", "n_tokens", 1000, num_shards=4).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(
                docs.repartition(13), "doc_id", "n_tokens", 1000, num_shards=4
            ).collect(),
        )
    )
    assert a == b


def test_bad_args(spark, docs):
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(docs, "doc_id", "n_tokens", 0)


def test_negative_length_fails_loudly(spark):
    """A negative token count would GROW a bin's remaining budget and
    silently pack past max_len — corrupt input must kill the job."""
    bad = spark.createDataFrame(
        [(1, 100), (2, -5000), (3, 200)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="negative"):
        pack_sequences(bad, "doc_id", "n_tokens", 2048, num_shards=1).collect()
