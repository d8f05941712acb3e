"""Metric-history anomaly gate (plans/history.py): median/MAD
verdicts over the audit trail, robustness to a bad historical run,
insufficient-history arming, and the runner CLI wiring."""

from pyspark.sql import functions as F

from data_check_spark.plans.history import metric_anomalies

SCHEMA = "run_id string, partition string, column string, check string, metric double"


def _audit(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _history(metric_by_run, key=("p0", "lang", "max_null_rate")):
    p, c, k = key
    return [(r, p, c, k, m) for r, m in metric_by_run.items()]


def test_stable_metric_passes_and_spike_fails(spark):
    hist = {"r1": 0.10, "r2": 0.11, "r3": 0.09, "r4": 0.10}
    ok = _audit(spark, _history({**hist, "now": 0.105}))
    row = metric_anomalies(ok, "now", k=3.0).collect()[0]
    assert row["passed"] and row["n_history"] == 4
    assert abs(row["history_median"] - 0.10) < 1e-9

    spike = _audit(spark, _history({**hist, "now": 0.30}))
    row = metric_anomalies(spike, "now", k=3.0).collect()[0]
    assert not row["passed"]


def test_null_current_metric_fails_closed(spark):
    """A NULL current metric (e.g. an empty partition's try_divide
    stat) with sufficient history is unevaluable — it must FAIL, not
    emit passed=NULL, which neither filter direction would catch."""
    hist = {"r1": 0.10, "r2": 0.11, "r3": 0.09, "r4": 0.10}
    aud = _audit(spark, _history({**hist, "now": None}))
    row = metric_anomalies(aud, "now", k=3.0).collect()[0]
    assert row["passed"] is False  # False, not None
    assert row["n_history"] == 4


def test_mad_shrugs_off_one_bad_historical_run(spark):
    """One historically-bad run must not poison the baseline (the
    reason this is MAD, not stddev): current ~0.10 stays green even
    though history contains a 0.9 spike."""
    hist = {"r1": 0.10, "r2": 0.11, "r3": 0.09, "r4": 0.10, "bad": 0.90}
    a = _audit(spark, _history({**hist, "now": 0.12}))
    row = metric_anomalies(a, "now", k=3.0, min_rel=0.05).collect()[0]
    assert row["passed"]
    assert abs(row["history_median"] - 0.10) < 1e-9  # not dragged up


def test_constant_history_needs_floor(spark):
    """MAD = 0 on a constant history: without a floor any float dust
    flags; min_rel gives the tolerance a relative floor."""
    hist = {"r1": 0.10, "r2": 0.10, "r3": 0.10}
    a = _audit(spark, _history({**hist, "now": 0.1005}))
    strict = metric_anomalies(a, "now", k=3.0).collect()[0]
    assert not strict["passed"]  # zero tolerance, any move flags
    floored = metric_anomalies(a, "now", k=3.0, min_rel=0.01).collect()[0]
    assert floored["passed"]


def test_insufficient_history_passes_armed_later(spark):
    a = _audit(spark, _history({"r1": 0.10, "now": 5.0}))
    row = metric_anomalies(a, "now", min_history=3).collect()[0]
    assert row["passed"] and row["n_history"] == 1
    # a key never seen before also passes (left joins -> NULL median)
    b = _audit(
        spark,
        _history({"r1": 0.1, "r2": 0.1, "r3": 0.1})
        + [("now", "p1", "text", "max_null_rate", 0.5)],
    )
    rows = {r["partition"]: r for r in metric_anomalies(b, "now").collect()}
    assert rows["p1"]["passed"] and rows["p1"]["n_history"] == 0


def test_keys_gate_independently(spark):
    rows = []
    for r, m in {"r1": 0.1, "r2": 0.1, "r3": 0.1, "now": 0.1}.items():
        rows.append((r, "p0", "lang", "max_null_rate", m))
    for r, m in {"r1": 10.0, "r2": 11.0, "r3": 9.0, "now": 40.0}.items():
        rows.append((r, "p0", "text", "min_avg_tokens", m))
    a = _audit(spark, rows)
    got = {r["check"]: r["passed"] for r in
           metric_anomalies(a, "now", k=3.0, min_rel=0.01).collect()}
    assert got == {"max_null_rate": True, "min_avg_tokens": False}


def test_last_k_runs_windows_history(spark):
    """A years-old regime (metric ~10x today's) must drop out of the
    baseline once the window excludes it: unwindowed, the current
    value flags as anomalous against the mixed-regime median; with
    last_k_runs(5) the old runs vanish and it passes."""
    import datetime

    from data_check_spark.plans.history import last_k_runs

    rows = []
    t0 = datetime.datetime(2026, 1, 1)
    for i, (r, m) in enumerate(
        [("old1", 1.0), ("old2", 1.1), ("old3", 0.9), ("old4", 1.05),
         ("old5", 0.95),
         ("r1", 0.10), ("r2", 0.11), ("r3", 0.09),
         ("now", 0.105)]
    ):
        rows.append(
            (r, "p0", "lang", "max_null_rate", m,
             t0 + datetime.timedelta(days=i))
        )
    a = spark.createDataFrame(
        rows, SCHEMA + ", audit_ts timestamp"
    )
    unwindowed = metric_anomalies(a, "now", k=3.0, min_rel=0.05).collect()[0]
    assert not unwindowed["passed"]  # old-regime-dominated median ~1.0
    windowed = metric_anomalies(
        last_k_runs(a, 4), "now", k=3.0, min_rel=0.05
    ).collect()[0]
    assert windowed["passed"] and windowed["n_history"] == 3


def test_runner_anomaly_gate(spark, tmp_path):
    """Four identical synth runs (the synth corpus carries planted
    dirt, so each run's threshold rc is 1 — that's its baseline): the
    fourth gates against the first three with --anomaly-gate and must
    flag NOTHING (stable metrics + relative floor), i.e. its rc stays
    at the threshold rc. The gate rows are then re-derived directly
    and checked green for every key of the current run."""
    from data_check_spark.plans.history import audit_anomalies
    from data_check_spark.runner import main

    out = str(tmp_path / "run_anom")
    base = ["--synthesize", "2000", "--out", out, "--partitions", "4"]
    assert main(base) == 1  # planted dirt: threshold failures exist
    assert main(base + ["--reset"]) == 1
    assert main(base + ["--reset"]) == 1
    assert main(base + ["--reset", "--anomaly-gate", "3.0"]) == 1
    audit = spark.read.parquet(f"{out}/audit/verdicts")
    assert audit.select("run_id").distinct().count() == 4
    current = (
        audit.orderBy(F.col("audit_ts").desc()).select("run_id").first()["run_id"]
    )
    anom = audit_anomalies(spark, f"{out}/audit", current, k=3.0, min_rel=0.01)
    rows = anom.collect()
    assert rows and all(r["passed"] for r in rows)
    assert all(r["n_history"] == 3 for r in rows)
