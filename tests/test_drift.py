import math

import pyspark.sql.functions as F
import pytest

from data_check_spark.operators.drift import (
    categorical_frequencies,
    ks_statistic,
    numeric_histogram,
    psi_categorical,
    psi_numeric,
)


def test_categorical_frequencies(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], "lang string")
    rows = {r["category"]: r for r in categorical_frequencies(df, "lang").collect()}
    assert rows["a"]["n"] == 2 and rows["a"]["freq"] == pytest.approx(0.5)
    assert rows[None]["freq"] == pytest.approx(0.25)  # NULL is its own bucket


def test_psi_categorical_identical_is_zero(spark):
    df = spark.createDataFrame([("a",), ("b",), ("b",)], "lang string")
    psi = psi_categorical(df, df, "lang").collect()[0]["psi"]
    assert psi == pytest.approx(0.0, abs=1e-9)


def test_psi_categorical_known_value(spark):
    # p = {a:.5, b:.5}; q = {a:.25, b:.75}
    d1 = spark.createDataFrame([("a",), ("a",), ("b",), ("b",)], "c string")
    d2 = spark.createDataFrame([("a",), ("b",), ("b",), ("b",)], "c string")
    expected = (0.5 - 0.25) * math.log(0.5 / 0.25) + (0.5 - 0.75) * math.log(0.5 / 0.75)
    psi = psi_categorical(d1, d2, "c").collect()[0]["psi"]
    assert psi == pytest.approx(expected, abs=1e-6)


def test_psi_categorical_null_bucket_is_one_category(spark):
    """The NULL bucket must match itself across versions (eqNullSafe):
    two IDENTICAL half-NULL distributions are zero drift, not a huge
    false PSI from each side's NULL row hitting the epsilon floor."""
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "lang string"
    )
    row = psi_categorical(df, df, "lang").collect()[0]
    assert row["psi"] == pytest.approx(0.0, abs=1e-9)
    assert row["n_categories"] == 2  # 'a' + the NULL bucket, once each


def test_numeric_histogram_drops_nan(spark):
    """NaN passes isNotNull but must not land in an edge bucket and
    inflate its mass (a 0/0 ratio feature would fire false drift)."""
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (5.0,)], "v double"
    )
    rows = {r["bucket"]: r["n"] for r in numeric_histogram(df, "v", 0, 10, 5).collect()}
    assert sum(rows.values()) == 2  # NaN dropped, like NULL
    assert rows.get(0) == 1 and rows.get(2) == 1


def test_numeric_histogram_clamps_and_drops_nulls(spark):
    df = spark.createDataFrame([(x,) for x in [-5.0, 0.0, 5.0, 99.0, None]], "v double")
    rows = {r["bucket"]: r["n"] for r in numeric_histogram(df, "v", 0, 10, 10).collect()}
    assert rows[0] == 2  # -5 clamped into bucket 0, plus 0.0
    assert rows[5] == 1
    assert rows[9] == 1  # 99 clamped into last bucket
    assert sum(rows.values()) == 4  # NULL dropped


def test_psi_numeric_and_ks(spark):
    d1 = spark.createDataFrame([(float(i % 10),) for i in range(100)], "v double")
    d2 = spark.createDataFrame([(float(i % 10) + 2.0,) for i in range(100)], "v double")
    assert psi_numeric(d1, d1, "v", 0, 12, 12).collect()[0]["psi"] == pytest.approx(0.0, abs=1e-9)
    assert psi_numeric(d1, d2, "v", 0, 12, 12).collect()[0]["psi"] > 0.1
    # shifted uniform: KS = shift/range = 2/10 of d1 mass
    ks = ks_statistic(d1, d2, "v", 0, 12, 12).collect()[0]["ks"]
    assert ks == pytest.approx(0.2, abs=1e-6)
    assert ks_statistic(d1, d1, "v", 0, 12, 12).collect()[0]["ks"] == pytest.approx(0.0)
