"""Gap sessionization: semantics vs a pure-python recomputation,
strict-greater boundary, equal-ts ties, and parallelism invariance."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.sessionize import sessionize


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _python_sessions(rows, gap_s):
    """rows: (eid, key, ts). Returns {eid: session_seq}."""
    out = {}
    by_key = {}
    for eid, k, ts in rows:
        by_key.setdefault(k, []).append((ts, eid))
    for k, evs in by_key.items():
        evs.sort()
        seq, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap_s:
                seq += 1
            out[eid] = seq
            prev = ts
    return out


@pytest.fixture(scope="module")
def events(spark):
    rng = random.Random(7)
    rows = []
    t = 0.0
    for eid in range(400):
        t += rng.choice([1, 5, 30, 60, 299, 300, 301, 3000])
        rows.append((eid, f"u{rng.randrange(5)}", _ts(t)))
    return rows, spark.createDataFrame(rows, "eid bigint, k string, ts timestamp")


def test_matches_python(events):
    rows, df = events
    got = {
        r["eid"]: r["session_seq"]
        for r in sessionize(df, "k", "ts", 300.0, tiebreak_col="eid").collect()
    }
    assert got == _python_sessions(rows, 300.0)


def test_boundary_is_strictly_greater(spark):
    df = spark.createDataFrame(
        [(1, "a", _ts(0)), (2, "a", _ts(300)), (3, "a", _ts(601))],
        "eid bigint, k string, ts timestamp",
    )
    got = {
        r["eid"]: r["session_seq"]
        for r in sessionize(df, "k", "ts", 300.0, tiebreak_col="eid").collect()
    }
    # gap of exactly 300 s stays in-session; 301 s starts a new one
    assert got == {1: 1, 2: 1, 3: 2}


def test_equal_ts_stays_one_session(spark):
    df = spark.createDataFrame(
        [(1, "a", _ts(0)), (2, "a", _ts(0)), (3, "a", _ts(0))],
        "eid bigint, k string, ts timestamp",
    )
    seqs = {
        r["session_seq"]
        for r in sessionize(df, "k", "ts", 10.0, tiebreak_col="eid").collect()
    }
    assert seqs == {1}


def test_parallelism_invariance(events):
    _, df = events
    a = sorted(
        map(
            tuple,
            sessionize(df.repartition(1), "k", "ts", 300.0, tiebreak_col="eid")
            .select("eid", "session_seq")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            sessionize(df.repartition(17), "k", "ts", 300.0, tiebreak_col="eid")
            .select("eid", "session_seq")
            .collect(),
        )
    )
    assert a == b


def test_single_window_operator(events):
    """Both window functions (lag + running sum) must ride one
    Window/shuffle — the operator's cost claim."""
    _, df = events
    plan = (
        sessionize(df, "k", "ts", 300.0, tiebreak_col="eid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_bad_gap(events):
    _, df = events
    with pytest.raises(ValueError, match="positive"):
        sessionize(df, "k", "ts", 0.0)


def test_null_timestamp_fails_loudly(spark):
    """The docstring's 'NULL timestamps are rejected' is enforced, not
    aspirational: a NULL ts would sort first and shift every real
    session index for its key, so the job dies on the first one."""
    df = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00"), ("k", None)], "k string, s string"
    ).withColumn("ts", F.col("s").cast("timestamp"))
    with pytest.raises(Exception, match="NULL ts"):
        sessionize(df, "k", "ts", 300.0).collect()
