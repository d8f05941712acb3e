"""spread_cpu (operators/spread.py): the conditional CPU spread must
fire exactly in its window — under-split source AND enough input
bytes per core — and must never change results, only partitioning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators import spread as spread_mod
from data_check_spark.operators.spread import _input_bytes, spread_cpu


@pytest.fixture(scope="module")
def spark():
    from data_check_spark.session import get_spark

    s = get_spark("test-spread", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def one_file_parquet(spark, tmp_path_factory):
    """A single-file, single-row-group parquet source — the
    under-split shape the spread exists for."""
    p = str(tmp_path_factory.mktemp("spread") / "t.parquet")
    spark.range(5000).selectExpr(
        "id", "repeat('x', 64) as text"
    ).coalesce(1).write.parquet(p)
    return p


def test_no_op_below_work_floor(spark, one_file_parquet):
    """Under-split but tiny: the per-core byte floor keeps the frame
    unchanged (no exchange) — the sf0.1 regression guard."""
    df = spark.read.parquet(one_file_parquet)
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = spread_cpu(df, "id")
    assert out is df


def test_spreads_under_split_big_input(spark, one_file_parquet, monkeypatch):
    """Under-split and above the floor: hash-repartitioned to
    defaultParallelism, same rows."""
    monkeypatch.setattr(spread_mod, "MIN_BYTES_PER_SLOT", 1)
    df = spark.read.parquet(one_file_parquet)
    out = spread_cpu(df, "id")
    assert out is not df
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert "Exchange hashpartitioning" in out._jdf.queryExecution().executedPlan().toString()
    assert sorted(r["id"] for r in out.collect()) == list(range(5000))


def test_no_op_when_well_split(spark, one_file_parquet, monkeypatch):
    """A source already supplying >= defaultParallelism partitions is
    returned untouched even above the floor — the 100 TB case."""
    monkeypatch.setattr(spread_mod, "MIN_BYTES_PER_SLOT", 1)
    df = spark.range(1000).repartition(8)  # 8 >= local[4] parallelism
    out = spread_cpu(df, "id")
    assert out is df


def test_input_bytes_matches_disk(spark, one_file_parquet):
    size = _input_bytes(spark.read.parquet(one_file_parquet))
    on_disk = sum(
        os.path.getsize(os.path.join(one_file_parquet, f))
        for f in os.listdir(one_file_parquet)
        if f.endswith(".parquet")
    )
    assert size == on_disk


def test_input_bytes_unknown_for_non_file_source(spark):
    """Non-file-backed frames report None (treated as 'big', so the
    spread still fires for them when under-split)."""
    df = spark.createDataFrame([(1, "a")], "id long, t string")
    assert _input_bytes(df) is None
