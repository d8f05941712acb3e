"""ObservedSuite: zero-extra-scan verdicts riding the caller's own
action (plans/observed.py). Parity contract: the observed verdict
rows must EQUAL the batch suite's rows for the same checks run
globally (constant partition) — same metrics, same fail-closed
semantics, same summary row."""
import pytest
from pyspark.sql import functions as F

from data_check_spark.plans.observed import ObservedSuite
from data_check_spark.plans.suite import (
    CheckSuite,
    ExprCheck,
    StatsCheck,
    UniquenessCheck,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _suite():
    return CheckSuite([
        StatsCheck(thresholds={
            "text": {"max_null_rate": 0.05, "min_rows": 1.0,
                     "min_avg_bytes": 10.0},
            "lang": {"min_distinct": 2.0, "max_null_rate": 0.0},
        }, approx=True),
        ExprCheck(name="nchars_nonneg", predicate_sql="n_chars >= 0",
                  max_violation_ratio=0.0),
        # deliberately failing gate: no document is shorter than its
        # own n_chars on the synth corpus, so ratio 1.0 > 0.0
        ExprCheck(name="text_short", predicate_sql="length(text) < n_chars",
                  max_violation_ratio=0.0),
    ])


def test_observed_matches_batch_suite(spark, sf_dir):
    d = _docs(spark, sf_dir)
    suite = _suite()
    osuite = ObservedSuite(suite)
    d2, obs = osuite.attach(d)
    d2.write.format("noop").mode("overwrite").save()
    got = sorted(map(tuple, osuite.verdicts(spark, obs).collect()))
    want = sorted(map(tuple, suite.run(
        spark, d.withColumn("_p", F.lit("*")), "_p").verdicts.collect()))
    assert got == want
    # both directions exercised: text_short fails, the rest pass
    # (the '*'/'all' summary row covers the STATS verdicts only,
    # matching the batch suite contract — got==want above proves it)
    failed = {r[1] for r in got if not r[5]}
    assert failed == {"text_short"}


def test_observed_per_check_approx_is_order_independent(spark, sf_dir):
    """approx is PER CHECK: a later approx=False StatsCheck must not
    flip an earlier approx=True check's columns to exact aggregates —
    that would sneak a countDistinct past the min_distinct guard and
    Spark would reject the whole observation at attach time."""
    d = _docs(spark, sf_dir)
    suite = CheckSuite([
        StatsCheck(thresholds={"lang": {"min_distinct": 2.0}}, approx=True),
        StatsCheck(thresholds={"text": {"max_null_rate": 0.5}}, approx=False),
    ])
    osuite = ObservedSuite(suite)
    d2, obs = osuite.attach(d)  # INVALID_OBSERVED_METRICS before the fix
    d2.write.format("noop").mode("overwrite").save()
    rows = {r["check"]: r for r in osuite.verdicts(spark, obs).collect()}
    assert rows["min_distinct"]["passed"]
    assert rows["max_null_rate"]["passed"]


def test_observed_adds_no_exchange_and_no_second_scan(spark, sf_dir):
    """The observation must not change the plan shape: a map-only
    frame stays exchange-free with metrics attached (CollectMetrics
    is accumulator-backed, not an aggregation stage)."""
    d = _docs(spark, sf_dir).select("doc_id", "text", "lang", "n_chars")
    osuite = ObservedSuite(_suite())
    d2, obs = osuite.attach(d)
    plan = d2._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "collect_metrics" in plan.lower() or "CollectMetrics" in plan


def test_observed_rejects_shuffle_checks():
    with pytest.raises(ValueError, match="UniquenessCheck"):
        ObservedSuite(CheckSuite([UniquenessCheck(key="doc_id")]))


def test_observed_rejects_exact_distinct():
    with pytest.raises(ValueError, match="DISTINCT"):
        ObservedSuite(CheckSuite([
            StatsCheck(thresholds={"lang": {"min_distinct": 2.0}},
                       approx=False),
        ]))
    with pytest.raises(ValueError, match="exact_distinct"):
        ObservedSuite(CheckSuite([
            StatsCheck(thresholds={"lang": {"max_null_rate": 0.5}},
                       exact_distinct=("lang",)),
        ]))


def test_observed_rejects_empty_and_duplicates():
    with pytest.raises(ValueError, match="no observable"):
        ObservedSuite(CheckSuite([]))
    with pytest.raises(ValueError, match="duplicate"):
        ObservedSuite(CheckSuite([
            ExprCheck(name="a", predicate_sql="1=1"),
            ExprCheck(name="a", predicate_sql="2=2"),
        ]))
    with pytest.raises(ValueError, match="duplicate stat"):
        ObservedSuite(CheckSuite([
            StatsCheck(thresholds={"text": {"min_rows": 1.0}}),
            StatsCheck(thresholds={"text": {"max_null_rate": 0.5}}),
        ]))


def test_observed_streaming_twin(spark, sf_dir, tmp_path):
    """Named observation: the same verdict rows fall out of a
    streaming query's observedMetrics — per micro-batch, still zero
    extra scans."""
    src = str(tmp_path / "src")
    d = _docs(spark, sf_dir).select("doc_id", "text", "lang", "n_chars")
    d.coalesce(1).write.parquet(src)

    suite = _suite()
    osuite = ObservedSuite(suite)
    stream = spark.readStream.schema(d.schema).parquet(src)
    observed = osuite.attach(stream, streaming=True)
    assert observed.isStreaming
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progress = [p for p in q.recentProgress
                if p.get("observedMetrics", {}).get(osuite.name)]
    assert progress, "no epoch carried the named observation"
    metrics = progress[-1]["observedMetrics"][osuite.name]
    got = sorted(map(tuple, osuite.verdicts(spark, metrics).collect()))
    want = sorted(map(tuple, suite.run(
        spark, d.withColumn("_p", F.lit("*")), "_p").verdicts.collect()))
    assert got == want
