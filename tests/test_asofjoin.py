"""As-of join: semantics vs pandas merge_asof (the single-node
reference implementation), deterministic tie-breaking, forward mode,
tolerance, and parallelism-invariance of the distributed plan."""

import datetime as dt

import pandas as pd
import pytest

from data_check_spark.operators.asofjoin import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    # Multiple keys, out-of-order input, exact-tie timestamps, a key
    # with no right rows, and a left row before any right row.
    left_rows = [
        (1, "a", _ts(10), 1.0),
        (2, "a", _ts(5), 2.0),
        (3, "a", _ts(30), 3.0),
        (4, "b", _ts(7), 4.0),
        (5, "b", _ts(100), 5.0),
        (6, "c", _ts(50), 6.0),  # key with no right rows
        (7, "a", _ts(20), 7.0),  # exactly equal to a right ts
    ]
    right_rows = [
        (101, "a", _ts(8), 10.0),
        (102, "a", _ts(20), 20.0),
        (103, "a", _ts(20), 21.0),  # exact (key, ts) tie with 102
        (104, "a", _ts(25), 30.0),
        (105, "b", _ts(50), 40.0),
        (106, "b", _ts(6), 50.0),
    ]
    left = spark.createDataFrame(
        left_rows, "lid bigint, k string, ts timestamp, lv double"
    )
    right = spark.createDataFrame(
        right_rows, "rid bigint, k string, ts timestamp, rv double"
    )
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    lp = left.toPandas().sort_values("ts").reset_index(drop=True)
    # merge_asof breaks exact-ts ties positionally: backward takes the
    # LAST tied row in input order, forward the FIRST. Order rid
    # within ties so both cases resolve to the LARGEST rid — the
    # operator's documented tie rule.
    rp = (
        right.toPandas()
        .sort_values(["ts", "rid"], ascending=[True, direction == "backward"])
        .reset_index(drop=True)
        .rename(columns={"ts": "ts_asof", "rid": "rid_asof", "rv": "rv_asof"})
    )
    tol = pd.Timedelta(seconds=tolerance) if tolerance is not None else None
    return pd.merge_asof(
        lp, rp, left_on="ts", right_on="ts_asof", by="k",
        direction=direction, allow_exact_matches=True, tolerance=tol,
    ).sort_values("lid").reset_index(drop=True)


def _spark_asof(left, right, direction, tolerance=None):
    out = asof_join(
        left, right, "k", "ts", ["rv", "rid"],
        direction=direction, tolerance=tolerance, tiebreak_col="rid",
    )
    return (
        out.toPandas().sort_values("lid").reset_index(drop=True)
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_pandas_merge_asof(frames, direction):
    left, right = frames
    got = _spark_asof(left, right, direction)
    want = _pandas_asof(left, right, direction)
    for c in ("ts_asof", "rv_asof", "rid_asof"):
        g = [None if pd.isna(v) else v for v in got[c]]
        w = [None if pd.isna(v) else v for v in want[c]]
        assert g == w, (c, g, w)


def test_exact_tie_takes_largest_tiebreak(frames):
    left, right = frames
    got = _spark_asof(left, right, "backward").set_index("lid")
    # left lid=7 at ts=20 ties two right rows (rid 102, 103) — the
    # larger rid wins, and the tie is an at-or-before match.
    assert got.loc[7, "rid_asof"] == 103
    assert got.loc[7, "rv_asof"] == 21.0


def test_no_match_is_null(frames):
    left, right = frames
    got = _spark_asof(left, right, "backward").set_index("lid")
    assert pd.isna(got.loc[6, "rid_asof"])  # key 'c': no right rows
    assert pd.isna(got.loc[2, "rid_asof"])  # ts=5 before first 'a' right (8)


def test_tolerance(frames):
    left, right = frames
    got = _spark_asof(left, right, "backward", tolerance=3.0).set_index("lid")
    # lid=1 (a, ts=10): nearest right at 8, gap 2s <= 3 -> kept
    assert got.loc[1, "rid_asof"] == 101
    # lid=3 (a, ts=30): nearest right at 25, gap 5s > 3 -> nulled
    assert pd.isna(got.loc[3, "rid_asof"])
    want = _pandas_asof(left, right, "backward", tolerance=3.0)
    g = [None if pd.isna(v) else v for v in got["rid_asof"]]
    w = [None if pd.isna(v) else v for v in want["rid_asof"]]
    assert g == w


def test_parallelism_invariance(frames):
    left, right = frames
    a = _spark_asof(left.repartition(1), right.repartition(1), "backward")
    b = _spark_asof(left.repartition(13), right.repartition(7), "backward")
    pd.testing.assert_frame_equal(a, b)


def test_left_columns_preserved(frames):
    left, right = frames
    out = asof_join(left, right, "k", "ts", ["rv"], tiebreak_col="rid")
    assert out.columns == ["lid", "k", "ts", "lv", "ts_asof", "rv_asof"]
    assert out.count() == left.count()


def test_single_exchange_no_join_plan(frames):
    """The as-of plan must be union -> ONE Exchange -> Sort -> Window —
    no join operator, no second shuffle (the operator's cost claim)."""
    left, right = frames
    plan = (
        asof_join(left, right, "k", "ts", ["rv"], tiebreak_col="rid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_null_ts_rows(spark):
    """NULL-ts right rows match nothing (they must not get carried as
    'earliest' under nulls-first sort); NULL-ts left rows survive with
    a NULL match."""
    left = spark.createDataFrame(
        [(1, "a", _ts(10), 1.0), (2, "a", None, 2.0)],
        "lid bigint, k string, ts timestamp, lv double",
    )
    right = spark.createDataFrame(
        [(101, "a", None, 99.0), (102, "a", _ts(5), 10.0)],
        "rid bigint, k string, ts timestamp, rv double",
    )
    got = {
        r["lid"]: (r["rid_asof"], r["rv_asof"])
        for r in asof_join(left, right, "k", "ts", ["rv", "rid"], tiebreak_col="rid").collect()
    }
    assert got[1] == (102, 10.0)      # real match; NULL-ts 101 ignored
    assert got[2] == (None, None)     # NULL-ts left row kept, no match
    assert len(got) == 2
