"""Property-based invariants for the diff family (hypothesis): for
ANY pair of unique-keyed tables, the census/exclusive/ratio outputs
obey the algebra that defines them. Deliberately few, fast examples —
each example is a real Spark job."""

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_check_spark.operators.rowdiff import (
    column_match_ratios,
    exclusive_rows,
    pk_census,
)

values = st.one_of(st.none(), st.integers(-5, 5), st.sampled_from(["x", "y", "none", "non"]))
rows = st.dictionaries(st.integers(0, 30), st.tuples(values, values), min_size=0, max_size=15)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(d1=rows, d2=rows)
def test_census_and_exclusives_algebra(spark, d1, d2):
    t1 = spark.createDataFrame(
        [(k, str(v[0]) if v[0] is not None else None, str(v[1]) if v[1] is not None else None)
         for k, v in d1.items()] or [(None, None, None)],
        "A bigint, B string, C string",
    ).filter(F.col("A").isNotNull())
    t2 = spark.createDataFrame(
        [(k, str(v[0]) if v[0] is not None else None, str(v[1]) if v[1] is not None else None)
         for k, v in d2.items()] or [(None, None, None)],
        "A bigint, B string, C string",
    ).filter(F.col("A").isNotNull())

    k1, k2 = set(d1), set(d2)
    census = pk_census(t1, t2, "A").collect()[0]
    assert census["total_rows"] == len(k1 | k2)
    assert census["missing_primary_keys_table1"] == len(k2 - k1)
    assert census["missing_primary_keys_table2"] == len(k1 - k2)

    ex1 = exclusive_rows(t1, t2, "A", side=1).count()
    ex2 = exclusive_rows(t1, t2, "A", side=2).count()
    assert ex1 == len(k1 - k2) and ex2 == len(k2 - k1)

    if k1 & k2:
        ratios = column_match_ratios(t1, t2, "A").collect()
        for r in ratios:
            assert r["count_common"] == len(k1 & k2)
            for f in ("ratio_not_null", "ratio_equal", "percentage_diff_values"):
                assert r[f] is None or 0.0 <= r[f] <= 1.0
