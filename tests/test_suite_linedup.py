import pytest

from data_check_spark.plans.manifest import Manifest
from data_check_spark.plans.suite import CheckSuite, LineDupCheck

# corpus: "Cookie banner" in 3 docs (normalized), "Footer 2024" in 2;
# 9 total segments, 5 duplicated occurrences -> dup_line_frac = 5/9
_DOCS = [
    (1, "Cookie  banner\nunique alpha content\nFooter 2024", "p1"),
    (2, "cookie banner\nunique beta content\nfooter 2024", "p2"),
    (3, "COOKIE BANNER\nunique gamma content", "p1"),
    (4, "entirely original line", "p2"),
]


def _docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string, part string")


def test_linedup_verdict_and_violations(spark):
    res = CheckSuite(
        [LineDupCheck(id_col="doc_id", max_dup_line_frac=0.6)]
    ).run(spark, _docs(spark), "part")
    v = res.verdicts.collect()
    assert len(v) == 1
    row = v[0]
    assert (row["partition"], row["column"], row["check"]) == ("*", "text", "dup_line_frac")
    assert row["metric"] == pytest.approx(5 / 9, abs=1e-6)
    assert row["passed"]
    viol = {r["doc_id"]: r for r in res.violations["linedup:text"].collect()}
    assert set(viol) == {1, 2, 3}
    # doc 2 has 2 of 3 segments duplicated, same as doc 1; doc 3 has 1 of 2
    assert viol[1]["n_dup_lines"] == 2 and viol[1]["n_lines"] == 3
    assert viol[3]["n_dup_lines"] == 1 and viol[3]["n_lines"] == 2
    assert viol[2]["dup_line_frac"] == pytest.approx(2 / 3, abs=1e-6)


def test_linedup_threshold_fails_and_no_dump(spark):
    res = CheckSuite(
        [LineDupCheck(id_col="doc_id", max_dup_line_frac=0.1, dump_violations=False)]
    ).run(spark, _docs(spark), "part")
    row = res.verdicts.collect()[0]
    assert not row["passed"]
    assert "linedup:text" not in res.violations


def test_linedup_empty_table_fails_closed(spark):
    empty = _docs(spark).filter("doc_id < 0")
    res = CheckSuite([LineDupCheck(id_col="doc_id")]).run(spark, empty, "part")
    row = res.verdicts.collect()[0]
    assert row["metric"] is None and not row["passed"]


def test_linedup_duplicate_guard(spark):
    with pytest.raises(ValueError, match="linedup"):
        CheckSuite(
            [LineDupCheck(), LineDupCheck(max_dup_line_frac=0.9)]
        ).run(spark, _docs(spark), "part")


def test_linedup_global_on_resume(spark, tmp_path):
    """A resumed run must report the same global verdict as an
    uninterrupted one: the check rides the unfiltered-table path."""
    man = Manifest(str(tmp_path / "m_ld"))
    man.mark_complete("p1", "prior", {})
    res = CheckSuite(
        [LineDupCheck(id_col="doc_id", max_dup_line_frac=0.6)]
    ).run_resumable(
        spark, _docs(spark), "part", man, audit_path=str(tmp_path / "audit")
    )
    ld = [r for r in res.verdicts.collect() if r["check"] == "dup_line_frac"]
    assert len(ld) == 1
    # 5/9 over the FULL table — not pending-p2's local ratio
    assert ld[0]["metric"] == pytest.approx(5 / 9, abs=1e-6)


def test_linedup_from_config(spark):
    from data_check_spark.plans.config import check_from_spec

    chk = check_from_spec(
        {"kind": "linedup", "id_col": "doc_id", "max_dup_line_frac": 0.6, "min_docs": 3}
    )
    assert isinstance(chk, LineDupCheck) and chk.min_docs == 3
    res = CheckSuite([chk]).run(spark, _docs(spark), "part")
    row = res.verdicts.collect()[0]
    # at min_docs=3 only the banner (3 docs) is boilerplate: 3/9
    assert row["metric"] == pytest.approx(3 / 9, abs=1e-6)
