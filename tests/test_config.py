"""Config-driven suites (plans/config.py): spec→check mapping, the
SQL-string / parquet-path / tuple bridges, loud failure on typos, and
the runner's --suite-config surface."""

import json

import pytest
from pyspark.sql import functions as F

from data_check_spark.plans.config import (
    check_from_spec,
    load_suite,
    suite_from_config,
)


def test_specs_build_every_declared_kind():
    from data_check_spark.plans import suite as S

    specs = [
        ({"kind": "stats", "thresholds": {"t": {"max_null_rate": 0.1}}},
         S.StatsCheck),
        ({"kind": "uniqueness", "key": "url"}, S.UniquenessCheck),
        ({"kind": "fd", "determinant": "url", "dependents": ["text"]},
         S.FunctionalDependencyCheck),
        ({"kind": "expr", "name": "s", "predicate_sql": "x > 0"},
         S.ExprCheck),
        ({"kind": "profile", "column": "lang", "min_entropy": 1.0},
         S.ProfileCheck),
        ({"kind": "repetition", "text_col": "text"}, S.RepetitionCheck),
        ({"kind": "schema", "expected": {"url": "string"}}, S.SchemaCheck),
        ({"kind": "fingerprint", "cols": ["url", "text"]},
         S.FingerprintCheck),
        ({"kind": "neardup", "text_col": "text", "id_col": "url"},
         S.NearDupCheck),
    ]
    for spec, cls in specs:
        assert isinstance(check_from_spec(spec), cls)
    fd = check_from_spec(
        {"kind": "fd", "determinant": "url", "dependents": ["text"]}
    )
    assert fd.dependents == ("text",)  # list coerced to tuple


def test_typo_fails_loudly():
    with pytest.raises(ValueError, match="unknown field"):
        check_from_spec({"kind": "uniqueness", "key": "url", "maxdups": 1})
    with pytest.raises(ValueError, match="unknown check kind"):
        check_from_spec({"kind": "uniquness", "key": "url"})
    with pytest.raises(ValueError, match="no checks"):
        suite_from_config({"checks": []})


def test_config_suite_runs_end_to_end(spark, tmp_path):
    """A JSON file with expr-string and reference-path bridges runs
    through CheckSuite.run and produces the configured verdicts."""
    d = spark.range(200).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("w "), F.repeat(F.lit("t "), (F.col("id") % 64 + 8).cast("int"))).alias("text"),
        (F.col("id") % 4).cast("string").alias("part"),
    )
    ref_path = str(tmp_path / "ref.parquet")
    d.write.parquet(ref_path)
    cfg = {
        "checks": [
            {"kind": "stats",
             "thresholds": {"text": {"max_null_rate": 0.0}}},
            {"kind": "uniqueness", "key": "url"},
            {"kind": "expr", "name": "scheme", "predicate_sql":
             "url LIKE 'u%'"},
            {"kind": "numeric_drift", "name": "len",
             "expr": "length(text)", "lo": 0, "hi": 4096,
             "reference_path": ref_path},
        ]
    }
    p = str(tmp_path / "suite.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    suite = load_suite(p)
    res = suite.run(spark, d, "part")
    checks = {r["check"] for r in res.verdicts.collect()}
    assert {"max_null_rate", "unique", "expr", "psi_numeric"} <= checks
    # identical reference -> zero drift; everything here passes
    assert res.verdicts.filter(~F.col("passed")).count() == 0


def test_runner_suite_config(spark, tmp_path):
    from data_check_spark.runner import main

    cfg = {"checks": [
        {"kind": "uniqueness", "key": "url"},
        {"kind": "expr", "name": "text_present",
         "predicate_sql": "text IS NOT NULL", "max_violation_ratio": 0.05},
    ]}
    p = str(tmp_path / "suite.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    out = str(tmp_path / "run_cfg")
    rc = main([
        "--synthesize", "2000", "--out", out, "--partitions", "4",
        "--suite-config", p,
    ])
    audit = spark.read.parquet(f"{out}/audit/verdicts")
    checks = {r["check"] for r in audit.collect()}
    # exactly the configured checks ran — none of the default suite
    assert "unique" in checks and "expr" in checks
    assert "max_null_rate" not in checks
    failed = audit.filter(~F.col("passed")).count()
    assert rc == (0 if failed == 0 else 1)
