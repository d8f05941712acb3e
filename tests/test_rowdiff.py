"""Data-level golden tests for the two-table comparison checks, on the
FIXTURES.md F1 schema (the reference's own unit-test schema:
pk A BIGINT, B BIGINT, C STRING — /root/reference/tests/processors/
test_bigquery.py:46-53). Expectations hand-computed from the
reference's SQL semantics incl. the §2.10 sentinel quirks."""

import pyspark.sql.functions as F
import pytest

from data_check_spark.operators.rowdiff import (
    column_match_ratios,
    exclusive_rows,
    pk_census,
    row_diff,
)

SCHEMA = "A bigint, B bigint, C string"


@pytest.fixture(scope="module")
def t1(spark):
    return spark.createDataFrame(
        [
            (1, 10, "x"),
            (2, 20, "y"),
            (3, None, None),
            (4, 40, "none"),
            (5, 50, "non"),
            (6, 60, "z"),
            (7, 70, "w"),
        ],
        SCHEMA,
    )


@pytest.fixture(scope="module")
def t2(spark):
    return spark.createDataFrame(
        [
            (1, 10, "x"),
            (2, 21, "y"),
            (3, None, None),
            (4, 40, None),
            (5, 50, None),
            (9, 90, "q"),
        ],
        SCHEMA,
    )


def test_pk_census(t1, t2):
    row = pk_census(t1, t2, "A").collect()[0]
    # full outer: 5 matched + 2 only-t1 + 1 only-t2 = 8
    assert row["total_rows"] == 8
    assert row["missing_primary_keys_table1"] == 1  # key 9
    assert row["missing_primary_keys_table2"] == 2  # keys 6, 7
    assert row["missing_primary_keys_table1_ratio"] == pytest.approx(1 / 8, abs=1e-6)


def test_exclusive_rows(t1, t2):
    ex1 = exclusive_rows(t1, t2, "A", side=1)
    assert [r["A"] for r in ex1.collect()] == [6, 7]
    ex2 = exclusive_rows(t1, t2, "A", side=2)
    assert [r["A"] for r in ex2.collect()] == [9]
    # LIMIT semantics (ref bigquery.py:105)
    assert exclusive_rows(t1, t2, "A", side=1, limit=1).count() == 1


def test_column_match_ratios_reference_semantics(t1, t2):
    """ratio_equal uses the asymmetric 'none'/'non' sentinels
    (bigquery.py:215): NULL==NULL is unequal; 'non' vs NULL is equal."""
    rows = {r["column"]: r for r in column_match_ratios(t1, t2, "A").collect()}
    b, c = rows["B"], rows["C"]
    assert b["count_common"] == 5
    assert b["ratio_not_null"] == pytest.approx(4 / 5)
    # equal: k1,k4,k5 ('10','40','50'); k2 differs; k3 NULL-vs-NULL unequal
    assert b["ratio_equal"] == pytest.approx(3 / 4)
    assert b["percentage_diff_values"] == pytest.approx(1 / 4)
    assert c["ratio_not_null"] == pytest.approx(4 / 5)
    # equal: k1 'x', k2 'y', and k5 'non' vs NULL→'non' (the latent
    # reference bug, reproduced); k3 unequal, k4 'none' vs 'non' unequal
    assert c["ratio_equal"] == pytest.approx(3 / 4)


def test_column_match_ratios_strict_mode(t1, t2):
    """Non-reference mode: both-non-null equality, no sentinel bug."""
    rows = {
        r["column"]: r
        for r in column_match_ratios(t1, t2, "A", reference_mode=False).collect()
    }
    # C equal: k1, k2 only (k5's 'non' vs NULL is NOT equal here)
    assert rows["C"]["ratio_equal"] == pytest.approx(2 / 4)


def test_row_diff_reference_semantics(t1, t2):
    """Row diff uses the symmetric 'none' sentinel (bigquery.py:179):
    NULL vs NULL not a diff; literal 'none' vs NULL ALSO not a diff."""
    d = row_diff(t1, t2, "A")
    assert [r["A"] for r in d.collect()] == [2, 5]
    assert set(d.columns) == {"A", "B__1", "B__2", "C__1", "C__2"}
    # paired projection carries canonical strings (ref P1 suffixes)
    k2 = d.filter(F.col("A") == 2).collect()[0]
    assert (k2["B__1"], k2["B__2"]) == ("20", "21")


def test_row_diff_nullsafe_mode(t1, t2):
    """eqNullSafe mode additionally flags k4 ('none' vs NULL)."""
    d = row_diff(t1, t2, "A", reference_mode=False)
    assert [r["A"] for r in d.collect()] == [2, 4, 5]


def test_row_diff_no_comparable_columns_raises(spark):
    """Only-pk overlap (or columns naming nothing common) is a clear
    error, not reduce()'s opaque 'empty iterable' TypeError."""
    import pytest as _pytest

    a = spark.createDataFrame([(1, "x")], "A long, only_in_a string")
    b = spark.createDataFrame([(1, "y")], "A long, only_in_b string")
    with _pytest.raises(ValueError, match="no columns to compare"):
        row_diff(a, b, "A")


def test_array_canonicalization(spark):
    """Arrays compare order- and duplicate-insensitively
    (ref models/table.py:96-102)."""
    a = spark.createDataFrame([(1, ["b", "a", "b"])], "A bigint, D array<string>")
    b = spark.createDataFrame([(1, ["a", "b"])], "A bigint, D array<string>")
    assert row_diff(a, b, "A").count() == 0
    c = spark.createDataFrame([(1, ["a", "c"])], "A bigint, D array<string>")
    assert row_diff(a, c, "A").count() == 1


def test_pk_census_duplicate_and_null_keys(spark):
    """The union+groupBy census must reproduce the full-outer JOIN's
    accounting exactly: duplicate keys multiply (n1*n2 matched rows),
    NULL keys never equi-match (each NULL row is unmatched on its own
    side). Verified against an inline join-based reference."""
    from pyspark.sql import functions as F

    from data_check_spark.operators.rowdiff import pk_census

    t1 = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,), (4,)], "k bigint"
    )
    t2 = spark.createDataFrame([(1,), (2,), (2,), (3,), (None,)], "k bigint")
    got = pk_census(t1, t2, "k").collect()[0]

    k1 = t1.select(F.col("k").alias("pk1"))
    k2 = t2.select(F.col("k").alias("pk2"))
    joined = k1.join(k2, k1["pk1"] == k2["pk2"], "full_outer")
    ref = joined.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_if(F.col("pk1").isNull()).alias("m1"),
        F.count_if(F.col("pk2").isNull()).alias("m2"),
    ).collect()[0]

    assert got["total_rows"] == ref["total"]
    assert got["missing_primary_keys_table1"] == ref["m1"]
    assert got["missing_primary_keys_table2"] == ref["m2"]
    # spot-check the arithmetic by hand: k=1 -> 2*1, k=2 -> 1*2,
    # k=4 -> 1 unmatched, k=3 -> 1 unmatched, NULLs -> 2+1 unmatched;
    # a NULL-key row leaves BOTH join key columns NULL, so all 3 NULL
    # rows count toward both missing counters (reference COUNTIF)
    assert got["total_rows"] == 2 + 2 + 1 + 1 + 3
    assert got["missing_primary_keys_table1"] == 1 + 3  # k=3 + all NULLs
    assert got["missing_primary_keys_table2"] == 1 + 3  # k=4 + all NULLs


def test_pk_census_empty_inputs(spark):
    from data_check_spark.operators.rowdiff import pk_census

    e = spark.createDataFrame([], "k bigint")
    got = pk_census(e, e, "k").collect()[0]
    assert got["total_rows"] == 0
    assert got["missing_primary_keys_table1"] == 0
    assert got["missing_primary_keys_table1_ratio"] is None


def test_empty_result_detection(spark):
    """SURVEY §2.10 empty-result parity: disjoint PK sets → the inner
    join matches 0 rows → all-NULL ratio_not_null must raise, like the
    reference's 'query returned no rows' (streamlit_app.py:252-255)."""
    from data_check_spark.operators.rowdiff import (
        EmptyResultError,
        collect_ratios_checked,
        column_match_ratios,
    )

    a = spark.createDataFrame([(1, "x"), (2, "y")], "pk int, v string")
    b = spark.createDataFrame([(3, "x"), (4, "z")], "pk int, v string")
    ratios = column_match_ratios(a, b, "pk")
    with pytest.raises(EmptyResultError, match="no rows"):
        collect_ratios_checked(ratios)
    # overlapping keys: returns the collected rows unchanged
    rows = collect_ratios_checked(column_match_ratios(a, a, "pk"))
    assert rows and all(r["ratio_not_null"] == 1.0 for r in rows)
