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


# ---- round-4 additions: splits and repetition metrics ----

keys = st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ks=keys)
def test_hash_split_matches_python_md5(spark, ks):
    """Spark's split labels equal a pure-python md5 recomputation —
    the engine-portability property the splitter exists for."""
    import hashlib

    from data_check_spark.functions.splits import hash_split, split_thresholds

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.createDataFrame([(k,) for k in ks], "k bigint")
    got = {r["k"]: r["split"] for r in hash_split(df, "k", fr).collect()}
    bounds = split_thresholds(fr)
    for k in ks:
        bucket = hashlib.md5(f"{k}:dcs".encode()).hexdigest()[:2]
        want = next(label for label, b in bounds if bucket < b)
        assert got[k] == want


tokens = st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=20)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ts=tokens)
def test_repetition_matches_counter(spark, ts):
    from collections import Counter

    from data_check_spark.functions.textstats import repetition_metrics

    text = " ".join(ts)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = repetition_metrics(df, "text").collect()[0]
    grams = [" ".join(ts[i : i + 2]) for i in range(len(ts) - 1)]
    if not grams:
        assert r["dup_2gram_frac"] is None and r["top_2gram_frac"] is None
    else:
        cnt = Counter(grams)
        assert r["dup_2gram_frac"] == round(1 - len(cnt) / len(grams), 6)
        assert r["top_2gram_frac"] == round(max(cnt.values()) / len(grams), 6)
