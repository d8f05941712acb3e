"""End-to-end test of the spark-submit entry point's main() — the
north rule's submission surface — including the --neardup-gate flag."""

import pytest
from pyspark.sql import functions as F

from data_check_spark.runner import main


def test_runner_synthesize_with_neardup_gate(spark, tmp_path):
    """The synth corpus is DELIBERATELY template-heavy (the phrase
    picker has a small vocabulary), so the default suite reports its
    planted dirt (rc=1) and the near-dup gate sees real duplicate
    mass — the global verdict row must land in the audit alongside
    the per-partition ones, with its dump."""
    out = str(tmp_path / "run")
    rc = main([
        "--synthesize", "2000",
        "--out", out,
        "--partitions", "4",
        "--neardup-gate", "0.5",
    ])
    audit = spark.read.parquet(f"{out}/audit/verdicts")
    nd = audit.filter(F.col("check") == "neardup_frac").collect()
    assert len(nd) == 1
    assert nd[0]["partition"] == "*"
    assert 0.0 <= nd[0]["metric"] <= 1.0
    # exit code reflects the OVERALL verdict set (synth dirt included)
    failed = audit.filter(~F.col("passed")).count()
    assert rc == (0 if failed == 0 else 1)
    viol = spark.read.parquet(f"{out}/audit/violations/neardup_text")
    assert viol.count() > 0  # template corpus: non-exemplar members exist
    # resume: everything complete -> nothing pending
    assert main(["--synthesize", "2000", "--out", out,
                 "--partitions", "4"]) == 2
