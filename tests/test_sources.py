"""Source abstraction tests: SQL-vs-table heuristic and the sampling
operator's reference gating (bigquery.py:21-45, data_processor.py:84-87,
slider bounds streamlit_app.py:176-180)."""

import pytest
from pyspark.sql import functions as F

from data_check_spark.sources.readers import (
    aligned_sample,
    is_sql_input,
    sampled_source,
    source,
)


@pytest.fixture(scope="module")
def table(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    df.createOrReplaceTempView("sample_t")
    return df


def test_is_sql_heuristic():
    assert is_sql_input("SELECT a FROM t")
    assert is_sql_input("with x as (select 1) select * from x")
    assert not is_sql_input("my_dataset.my_table")


def test_source_dispatch_matches_is_sql_input(spark, table):
    """source() routes through the SAME heuristic as sampled_source —
    a string classified SQL by is_sql_input must never hit
    spark.table. 'therefrom' tripped the old divergent copy: it
    contains 'from ' but not ' from '."""
    from data_check_spark.sources.readers import source

    q = "select 1 AS a, 2 AS therefrom"
    assert is_sql_input(q)
    assert [r["a"] for r in source(spark, q).collect()] == [1]
    assert source(spark, "sample_t").count() == 10_000


def test_sampling_rate_bounds(spark, table):
    with pytest.raises(ValueError, match=r"\[10, 100\]"):
        sampled_source(spark, "sample_t", sampling_rate=5)
    with pytest.raises(ValueError, match=r"\[10, 100\]"):
        sampled_source(spark, "sample_t", sampling_rate=101)


def test_sampling_gated_to_plain_tables(spark, table):
    # SQL input + rate < 100 → refused, like the reference's disabled slider
    with pytest.raises(ValueError, match="only available for direct tables"):
        sampled_source(spark, "SELECT * FROM sample_t", sampling_rate=50)
    # SQL input at 100 passes through un-sampled
    assert sampled_source(spark, "SELECT * FROM sample_t", 100).count() == 10_000


def test_sampling_rate_100_is_identity(spark, table):
    assert sampled_source(spark, "sample_t", 100).count() == 10_000


def test_sampling_rate_draws_about_p(spark, table):
    n = sampled_source(spark, "sample_t", 20, seed=1).count()
    assert 1500 < n < 2500  # Bernoulli(0.2) over 10k rows


def test_aligned_sample_same_keys_both_sides(spark, table):
    # the property TABLESAMPLE SYSTEM lacks: two tables sampled at the
    # same rate keep the SAME key set, so diff checks stay meaningful
    other = table.withColumn("v", F.col("v") + 1)
    k1 = {r["k"] for r in aligned_sample(table, "k", 10).select("k").collect()}
    k2 = {r["k"] for r in aligned_sample(other, "k", 10).select("k").collect()}
    assert k1 == k2
    assert 700 < len(k1) < 1300
