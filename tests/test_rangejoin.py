"""Bucketed range join vs the brute-force inequality join it must
reproduce exactly, across bucket widths, bounds modes, keyed/keyless,
and timestamp/numeric columns."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.rangejoin import interval_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, "u" + str(i % 3), _ts(7 * i)) for i in range(60)],
        "pid bigint, k string, ts timestamp",
    )
    # overlapping, nested, empty-span, and point-width intervals
    iv_rows = [
        (0, "u0", _ts(0), _ts(30)),
        (1, "u1", _ts(10), _ts(12)),
        (2, "u2", _ts(50), _ts(40)),  # end < start: matches nothing
        (3, "u0", _ts(100), _ts(100)),  # zero-length
        (4, "u1", _ts(90), _ts(300)),
        (5, "u2", _ts(140), _ts(141)),
        (6, "u0", _ts(35), _ts(260)),
    ]
    intervals = spark.createDataFrame(
        iv_rows, "iid bigint, k string, start_ts timestamp, end_ts timestamp"
    )
    return points, intervals


def _brute(points, intervals, bounds, keyed):
    upper = (
        F.col("ts") <= F.col("end_ts")
        if bounds == "closed"
        else F.col("ts") < F.col("end_ts")
    )
    cond = (F.col("ts") >= F.col("start_ts")) & upper
    iv = intervals.withColumnRenamed("k", "k2")
    if keyed:
        cond = cond & (F.col("k") == F.col("k2"))
    pairs = points.crossJoin(iv).filter(cond).select("pid", "iid")
    return sorted(map(tuple, pairs.collect()))


def _bucketed(points, intervals, bounds, keyed, width):
    iv = intervals if keyed else intervals.withColumnRenamed("k", "k2")
    got = interval_join(
        points, iv, "ts", "start_ts", "end_ts",
        bucket_width=width, key_col="k" if keyed else None, bounds=bounds,
    ).select("pid", "iid")
    return sorted(map(tuple, got.collect()))


@pytest.mark.parametrize("width", [1, 13, 120, 3600])
@pytest.mark.parametrize("bounds", ["closed", "half_open"])
@pytest.mark.parametrize("keyed", [False, True])
def test_matches_bruteforce(frames, width, bounds, keyed):
    points, intervals = frames
    assert _bucketed(points, intervals, bounds, keyed, width) == _brute(
        points, intervals, bounds, keyed
    )


def test_numeric_columns(spark):
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "pid bigint, x double"
    )
    intervals = spark.createDataFrame(
        [(0, 3.5, 10.0), (1, 9.0, 9.0), (2, 30.2, 55.0)],
        "iid bigint, lo double, hi double",
    )
    got = sorted(
        map(
            tuple,
            interval_join(points, intervals, "x", "lo", "hi", bucket_width=5.0)
            .select("pid", "iid")
            .collect(),
        )
    )
    want = sorted(
        [(i, 0) for i in range(4, 11)]
        + [(9, 1)]
        + [(i, 2) for i in range(31, 40)]
    )
    assert got == want


def test_parallelism_invariance(frames):
    points, intervals = frames
    a = _bucketed(points.repartition(1), intervals.repartition(1), "closed", True, 13)
    b = _bucketed(points.repartition(11), intervals.repartition(5), "closed", True, 13)
    assert a == b


def test_overlapping_names_rejected(frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="overlap"):
        # both sides carry 'k' but it is not declared as the key
        interval_join(points, intervals, "ts", "start_ts", "end_ts", bucket_width=10)


def test_reserved_bucket_name_rejected(frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="reserved"):
        interval_join(
            points, intervals.withColumnRenamed("k", "_b"),
            "ts", "start_ts", "end_ts", bucket_width=10,
        )


def test_bad_args(frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="bounds"):
        interval_join(
            points, intervals.withColumnRenamed("k", "k2"),
            "ts", "start_ts", "end_ts", bucket_width=10, bounds="open",
        )
    with pytest.raises(ValueError, match="positive"):
        interval_join(
            points, intervals.withColumnRenamed("k", "k2"),
            "ts", "start_ts", "end_ts", bucket_width=0,
        )


def test_hash_join_not_cartesian(frames):
    """The bucketed plan must be a hash (or sort-merge) equi-join —
    never the BroadcastNestedLoop/Cartesian plan Spark gives a raw
    inequality join."""
    points, intervals = frames
    plan = (
        interval_join(
            points, intervals.withColumnRenamed("k", "k2"),
            "ts", "start_ts", "end_ts", bucket_width=13,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan), plan
