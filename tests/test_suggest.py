"""Constraint suggestion (plans/suggest.py): rule firing, partition-
aware gate derivation, and the self-consistency contract (a suite
suggested from a table passes on that table)."""

from pyspark.sql import functions as F

from data_check_spark.plans.suggest import suggest_constraints, suggested_suite


def _pages(spark):
    """120 rows, 3 partitions: id unique, cat low-cardinality (3
    values), maybe_null NULL on one partition at 50% (hot partition),
    freeform ~unique text (not categorical)."""
    return spark.range(120).select(
        F.col("id"),
        F.concat(F.lit("p"), (F.col("id") % 3).cast("string")).alias("part"),
        F.concat(F.lit("cat"), (F.col("id") % 3).cast("string")).alias("cat"),
        F.when((F.col("id") % 3 == 0) & (F.col("id") % 2 == 0), None)
        .otherwise(F.concat(F.lit("v"), F.col("id").cast("string")))
        .alias("maybe_null"),
        F.concat(F.lit("txt-"), F.col("id").cast("string")).alias("freeform"),
    )


def _by_key(rows):
    return {(r["column"], r["check_kind"], r["param"]): r for r in rows}


def test_rules_fire_exact(spark):
    d = _pages(spark)
    s = _by_key(suggest_constraints(d, approx=False).collect())
    # complete columns lock at 0.0
    assert s[("id", "stats", "max_null_rate")]["value"] == 0.0
    assert s[("cat", "stats", "max_null_rate")]["value"] == 0.0
    # nullable column: gate = observed * 1.25 + 0.001, above observed
    nr = s[("maybe_null", "stats", "max_null_rate")]
    assert nr["observed"] > 0 and nr["value"] > nr["observed"]
    # unique column -> candidate key; 3-value cat does not; a NULLABLE
    # column with distinct non-null values is no key either (the
    # UniquenessCheck it would suggest counts the NULL group as
    # duplicates and would fail on its own training data)
    assert ("id", "uniqueness", "max_duplicate_keys") in s
    assert ("cat", "uniqueness", "max_duplicate_keys") not in s
    assert ("maybe_null", "uniqueness", "max_duplicate_keys") not in s
    # low-cardinality string -> vocabulary gate with headroom
    cat = s[("cat", "profile", "max_distinct")]
    assert cat["observed"] == 3.0 and cat["value"] == 5.0  # ceil(3*1.5)
    # ~unique freeform text exceeds categorical_max_distinct -> no gate
    assert ("freeform", "profile", "max_distinct") not in s
    # id is numeric: unique but never categorical
    assert ("id", "profile", "max_distinct") not in s
    # global volume floor: half the table
    vol = s[("*", "table", "min_rows")]
    assert (vol["observed"], vol["value"]) == (120.0, 60.0)


def test_partition_mode_tightens_to_enforcement_granularity(spark):
    d = _pages(spark)
    g = _by_key(suggest_constraints(d, approx=False).collect())
    p = _by_key(
        suggest_constraints(d, partition_col="part", approx=False).collect()
    )
    # null gate derives from the hottest partition (p0: 50% null),
    # which dominates the global rate (~16.7%)
    assert p[("maybe_null", "stats", "max_null_rate")]["observed"] == 0.5
    assert (
        p[("maybe_null", "stats", "max_null_rate")]["value"]
        > g[("maybe_null", "stats", "max_null_rate")]["value"]
    )
    # volume floor: half the smallest partition (40 rows each)
    vol = p[("*", "table", "min_rows")]
    assert (vol["observed"], vol["value"]) == (40.0, 20.0)


def test_suggested_suite_self_consistency(spark):
    """The contract: in exact mode with partition_col, the suggested
    suite PASSES on the table it was derived from — including the
    per-partition min_rows floor and hot-partition null gates."""
    d = _pages(spark)
    suite = suggested_suite(d, partition_col="part", approx=False)
    res = suite.run(spark, d, "part")
    failed = res.verdicts.filter(~F.col("passed"))
    assert failed.count() == 0
    # the floor made it into the suite (partition-aware only)
    v = {r["check"] for r in res.verdicts.collect()}
    assert "min_rows" in v and "max_null_rate" in v


def test_suggested_suite_catches_regression(spark):
    """A suite suggested from healthy data FAILS on degraded data:
    NULL-flood one partition's maybe_null and melt its volume."""
    d = _pages(spark)
    suite = suggested_suite(d, partition_col="part", approx=False)
    bad = d.withColumn(
        "maybe_null",
        F.when(F.col("part") == "p1", None).otherwise(F.col("maybe_null")),
    ).filter((F.col("part") != "p2") | (F.col("id") % 8 == 0))
    res = suite.run(spark, bad, "part")
    failed = {
        (r["partition"], r["column"], r["check"])
        for r in res.verdicts.filter(~F.col("passed")).collect()
    }
    assert ("p1", "maybe_null", "max_null_rate") in failed
    # the volume floor rides one (column-independent) threshold entry
    assert any(c == "min_rows" and p == "p2" for p, _, c in failed)


def test_global_mode_omits_min_rows_from_suite(spark):
    """Without partition_col the table-level floor stays a suggestion
    row only — StatsCheck's min_rows is per-partition, so wiring the
    global floor in would fail every partition smaller than half the
    table."""
    d = _pages(spark)
    suite = suggested_suite(d, approx=False)
    res = suite.run(spark, d, "part")
    assert res.verdicts.filter(F.col("check") == "min_rows").count() == 0


def test_hll_mode_plan_has_no_expand(spark):
    """approx=True (the 100 TB default) must keep the profile a plain
    fused aggregation: exact countDistinct would insert an Expand node
    (scan output multiplied per distinct-agg); HLL must not."""
    d = _pages(spark)
    plan = (
        suggest_constraints(d, approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan


def test_suggestions_persist_and_rebuild(spark, tmp_path):
    """The stored-baseline loop: persist suggestions to the audit,
    read the latest set back, rebuild the suite from the stored rows
    — and a human edit to the stored frame (dropping a rule) is
    honored by the rebuilt suite."""
    from data_check_spark.plans.suggest import (
        persist_suggestions,
        suggestions_from_audit,
        suite_from_suggestions,
    )

    d = _pages(spark)
    audit = str(tmp_path / "audit")
    s1 = suggest_constraints(d, partition_col="part", approx=False)
    persist_suggestions(s1, audit, "run1")
    # a later, different set: latest must win
    s2 = suggest_constraints(d, ["id", "cat", "part"], approx=False)
    persist_suggestions(s2, audit, "run2")
    stored = suggestions_from_audit(spark, audit)
    assert {r["column"] for r in stored.collect()} == {"*", "id", "cat", "part"}
    # human edit: drop the uniqueness rule before assembling
    edited = stored.filter(F.col("check_kind") != "uniqueness")
    suite = suite_from_suggestions(edited, approx=False)
    kinds = {type(c).__name__ for c in suite.checks}
    assert "UniquenessCheck" not in kinds and "StatsCheck" in kinds
    res = suite.run(spark, d, "part")
    assert res.verdicts.filter(F.col("check") == "unique").count() == 0


def test_min_rows_without_stats_rows_refuses(spark):
    """A (possibly human-edited) suggestion frame reduced to ONLY the
    volume floor cannot silently lose it: min_rows rides a StatsCheck
    entry, so with zero stats rows the assembly must raise instead of
    returning a suite that enforces nothing."""
    import pytest as _pytest

    from data_check_spark.plans.suggest import suite_from_suggestions

    only_floor = spark.createDataFrame(
        [("*", "table", "min_rows", 100.0, 200.0, "volume floor")],
        "column string, check_kind string, param string, "
        "value double, observed double, rationale string",
    )
    with _pytest.raises(ValueError, match="min_rows"):
        suite_from_suggestions(only_floor)


def test_runner_suggestion_loop(spark, tmp_path):
    """--suggest-to-audit persists the rows; a second run with
    --suite-from-suggestions assembles its suite from them (verdict
    set carries the suggested per-column gates instead of the
    default pages thresholds)."""
    from data_check_spark.runner import main

    out = str(tmp_path / "run_sugg")
    base = ["--synthesize", "2000", "--out", out, "--partitions", "4"]
    main(base + ["--suggest-to-audit"])
    stored = spark.read.parquet(f"{out}/audit/suggestions")
    assert stored.filter(F.col("param") == "max_null_rate").count() > 0
    rc = main(base + ["--reset", "--suite-from-suggestions"])
    audit = spark.read.parquet(f"{out}/audit/verdicts")
    runs = [
        r["run_id"]
        for r in audit.groupBy("run_id")
        .agg(F.max("audit_ts").alias("ts"))
        .orderBy(F.col("ts").desc())
        .collect()
    ]
    second = audit.filter(F.col("run_id") == runs[0])
    checks = {r["check"] for r in second.select("check").distinct().collect()}
    # suggested suite gates null rates per column (+ the volume floor)
    assert "max_null_rate" in checks and "min_rows" in checks
    # the suggestion-built suite has no referential/drift checks
    assert "ref_violation_rate" not in checks
    assert rc in (0, 1)


def test_hll_mode_still_finds_unique_key(spark):
    """approx=True resolves the uniqueness threshold to 0.95 so the
    HLL estimate (~2% rsd) still flags genuinely-unique columns."""
    d = _pages(spark)
    s = _by_key(suggest_constraints(d, approx=True).collect())
    assert ("id", "uniqueness", "max_duplicate_keys") in s
    assert ("cat", "uniqueness", "max_duplicate_keys") not in s
