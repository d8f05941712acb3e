import time

import pytest

from data_check_spark.session import run_with_timeout
from data_check_spark.sources.readers import source


def test_run_with_timeout_completes(spark):
    out = run_with_timeout(spark, lambda: spark.range(10).count(), timeout_sec=60)
    assert out == 10


def test_run_with_timeout_cancels(spark):
    import pyspark.sql.functions as F

    def slow():
        # a job that would take far longer than the timeout
        return (
            spark.range(0, 1 << 34, 1, 4)
            .select(F.sum(F.length(F.sha2(F.col("id").cast("string"), 256))))
            .collect()
        )

    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        run_with_timeout(spark, slow, timeout_sec=3)
    assert time.monotonic() - t0 < 30  # cancelled, not run to completion


def test_source_accepts_table_and_sql(spark):
    spark.range(5).createOrReplaceTempView("src_t")
    assert source(spark, "src_t").count() == 5
    assert source(spark, "SELECT * FROM src_t WHERE id < 2").count() == 2
