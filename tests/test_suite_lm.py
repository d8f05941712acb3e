"""LMCheck through the declarative suite: verdict agrees with a
direct bigram_lm_scores recomputation, violations rank by band
distance, fail-closed on an unscorable table, duplicate-column guard,
the global-on-resume contract, and the config path."""

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.lm import bigram_lm_scores
from data_check_spark.plans.manifest import Manifest
from data_check_spark.plans.suite import CheckSuite, LMCheck

# two fluent docs sharing most bigrams (high mean_p), one doc of
# unique vocabulary (every bigram rare -> low mean_p), one too-short
_DOCS = [
    (1, "the cat sat on the mat", "p1"),
    (2, "the cat sat on the rug", "p2"),
    (3, "zq xv qj wk vn pm", "p1"),
    (4, "solo", "p2"),  # < 2 tokens: not scored, not counted
]


def _docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string, part string")


def _band(spark):
    """Pick a band that isolates doc 3 as the only outlier."""
    scores = {
        r["doc_id"]: r["mean_p"]
        for r in bigram_lm_scores(_docs(spark).select("doc_id", "text")).collect()
    }
    assert set(scores) == {1, 2, 3}
    assert scores[3] < min(scores[1], scores[2])  # rare text scores lowest
    lo = (scores[3] + min(scores[1], scores[2])) / 2
    return lo, scores


def test_lm_verdict_and_violations(spark):
    lo, scores = _band(spark)
    res = CheckSuite(
        [LMCheck(min_mean_p=lo, max_outlier_frac=0.5)]
    ).run(spark, _docs(spark), "part")
    [row] = res.verdicts.collect()
    assert (row["partition"], row["column"], row["check"]) == (
        "*",
        "text",
        "lm_outlier_frac",
    )
    assert row["metric"] == pytest.approx(1 / 3, abs=1e-6)  # doc 3 of 3 scored
    assert row["passed"]
    viol = res.violations["lm:text"].collect()
    assert [r["doc_id"] for r in viol] == [3]
    assert viol[0]["mean_p"] == scores[3]


def test_lm_threshold_fails(spark):
    lo, _ = _band(spark)
    res = CheckSuite(
        [LMCheck(min_mean_p=lo, max_outlier_frac=0.2, dump_violations=False)]
    ).run(spark, _docs(spark), "part")
    [row] = res.verdicts.collect()
    assert not row["passed"]
    assert "lm:text" not in res.violations


def test_lm_unscorable_table_fails_closed(spark):
    df = spark.createDataFrame(
        [(1, "solo", "p1"), (2, None, "p1")], "doc_id long, text string, part string"
    )
    [row] = CheckSuite([LMCheck()]).run(spark, df, "part").verdicts.collect()
    assert row["metric"] is None and not row["passed"]


def test_lm_duplicate_guard(spark):
    with pytest.raises(ValueError, match="lm checks"):
        CheckSuite([LMCheck(), LMCheck(max_outlier_frac=0.9)]).run(
            spark, _docs(spark), "part"
        )


def test_lm_global_on_resume(spark, tmp_path):
    """A resumed run must train on the FULL corpus and report the
    same verdict as an uninterrupted one."""
    lo, _ = _band(spark)
    man = Manifest(str(tmp_path / "m_lm"))
    man.mark_complete("p1", "prior", {})
    res = CheckSuite(
        [LMCheck(min_mean_p=lo, max_outlier_frac=0.5)]
    ).run_resumable(
        spark, _docs(spark), "part", man, audit_path=str(tmp_path / "audit")
    )
    rows = [r for r in res.verdicts.collect() if r["check"] == "lm_outlier_frac"]
    assert len(rows) == 1
    # doc 3 (in completed p1!) still counts: 1/3, not pending-p2's 0/1
    assert rows[0]["metric"] == pytest.approx(1 / 3, abs=1e-6)


def test_lm_from_config(spark):
    from data_check_spark.plans.config import check_from_spec

    lo, _ = _band(spark)
    chk = check_from_spec(
        {"kind": "lm", "min_mean_p": lo, "max_outlier_frac": 0.5}
    )
    assert isinstance(chk, LMCheck)
    [row] = CheckSuite([chk]).run(spark, _docs(spark), "part").verdicts.collect()
    assert row["metric"] == pytest.approx(1 / 3, abs=1e-6) and row["passed"]
