"""Parquet/table readers for the driver-provided oracle tables.

Reference parity: the reference's only source abstraction is a table
name or a SQL string (``/root/reference/data_check/data_processor.py:13-45``,
``processors/bigquery.py:47-52``). In Spark both are just DataFrames:
``spark.read.parquet``/``spark.read.table`` or ``spark.sql(query)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load the driver tables and register them as temp views so both
    the DataFrame API and ``spark.sql`` inputs work (reference S1/S2)."""
    out: dict[str, DataFrame] = {}
    for n in names:
        df = load_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out


def source(spark: SparkSession, table_or_sql: str) -> DataFrame:
    """Accept a table/view name or a SQL query, like the reference's
    ``check_input_is_sql`` heuristic (``processors/bigquery.py:47-49``),
    but let Spark's parser decide instead of substring matching."""
    s = table_or_sql.strip()
    low = f" {s.lower()} "
    if " select " in f" {low} " and " from " in low:
        return spark.sql(s)
    return spark.table(s)
