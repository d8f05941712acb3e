import pytest
from pyspark.sql import functions as F

from data_check_spark.plans.manifest import Manifest
from data_check_spark.plans.suite import CheckSuite, NearDupCheck

_DISTINCT = [
    "the quick brown fox jumps over a lazy dog near the river",
    "spark executes declarative plans with catalyst and tungsten engines",
    "web crawl archives store raw html alongside extracted plain text",
    "validation suites emit one verdict row per partition and check",
    "minhash signatures approximate jaccard similarity between shingle sets",
    "referential checks broadcast dimension snapshots to every executor",
    "quantile sketches merge across partitions without rescanning rows",
    "streaming deduplication keeps bounded state keyed by url hash",
]


def _docs(spark):
    rows = [(i + 1, t, "p%d" % ((i % 2) + 1)) for i, t in enumerate(_DISTINCT)]
    # planted near-dups: two copies of doc 1, one copy of doc 2
    rows += [(101, _DISTINCT[0], "p1"), (102, _DISTINCT[0], "p2"), (103, _DISTINCT[1], "p1")]
    return spark.createDataFrame(rows, "doc_id long, text string, part string")


def test_neardup_verdict_and_violations(spark):
    df = _docs(spark)
    res = CheckSuite(
        [NearDupCheck(id_col="doc_id", max_neardup_frac=0.5)]
    ).run(spark, df, "part")
    v = res.verdicts.collect()
    assert len(v) == 1
    row = v[0]
    assert (row["partition"], row["column"], row["check"]) == ("*", "text", "neardup_frac")
    assert row["metric"] == pytest.approx(3 / 11, abs=1e-6)
    assert row["passed"]
    viol = {r["id"]: r for r in res.violations["neardup:text"].collect()}
    assert set(viol) == {101, 102, 103}
    assert viol[101]["component"] == 1 and viol[101]["cluster_size"] == 3
    assert viol[103]["component"] == 2 and viol[103]["cluster_size"] == 2


def test_neardup_threshold_fails(spark):
    res = CheckSuite(
        [NearDupCheck(id_col="doc_id", max_neardup_frac=0.1, dump_violations=False)]
    ).run(spark, _docs(spark), "part")
    row = res.verdicts.collect()[0]
    assert not row["passed"]
    assert "neardup:text" not in res.violations


def test_neardup_duplicate_guard(spark):
    with pytest.raises(ValueError, match="neardup"):
        CheckSuite(
            [NearDupCheck(), NearDupCheck(max_neardup_frac=0.9)]
        ).run(spark, _docs(spark), "part")


def test_neardup_clean_corpus_passes(spark):
    df = spark.createDataFrame(
        [(i + 1, t, "p1") for i, t in enumerate(_DISTINCT)],
        "doc_id long, text string, part string",
    )
    res = CheckSuite([NearDupCheck(id_col="doc_id")]).run(spark, df, "part")
    row = res.verdicts.collect()[0]
    assert row["metric"] == 0.0 and row["passed"]


def test_neardup_global_on_resume(spark, tmp_path):
    """A resumed run must report the same global verdict as an
    uninterrupted one: the check rides the unfiltered-table path."""
    df = _docs(spark)
    man = Manifest(str(tmp_path / "m_nd"))
    man.mark_complete("p1", "prior", {})
    res = CheckSuite(
        [NearDupCheck(id_col="doc_id", max_neardup_frac=0.5)]
    ).run_resumable(spark, df, "part", man, audit_path=str(tmp_path / "audit"))
    nd = [r for r in res.verdicts.collect() if r["check"] == "neardup_frac"]
    assert len(nd) == 1
    # 3/11 over the FULL table — NOT the 1/5-ish of pending p2 alone
    assert nd[0]["metric"] == pytest.approx(3 / 11, abs=1e-6)


def test_neardup_string_ids(spark):
    rows = [("u%02d" % (i + 1), t, "p1") for i, t in enumerate(_DISTINCT)]
    rows += [("u91", _DISTINCT[0], "p1"), ("u92", _DISTINCT[0], "p1")]
    df = spark.createDataFrame(rows, "url string, text string, part string")
    res = CheckSuite(
        [NearDupCheck(id_col="url", max_neardup_frac=0.5)]
    ).run(spark, df, "part")
    viol = {r["id"] for r in res.violations["neardup:text"].collect()}
    assert viol == {"u91", "u92"}  # exemplar u01 kept (min url)
