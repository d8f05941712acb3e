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
