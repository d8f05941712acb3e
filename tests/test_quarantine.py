"""Quarantine routing (operators/quarantine.py): per-rule reasons,
exemplar keeping, fail-closed expr semantics, split round-trip, and
the no-shuffle plan shape of row-local rules."""

from pyspark.sql import functions as F

from data_check_spark.operators.quarantine import (
    ExprRule,
    FDRule,
    NotNullRule,
    UniqueRule,
    route_rows,
    split,
)


def _pages(spark):
    rows = [
        # id, url, text, lang
        (1, "http://a", "alpha", "en"),
        (2, "http://b", "beta", "en"),
        (3, "http://b", "beta", "en"),        # dup url, same text (unique viol)
        (4, "http://c", "gamma", "fr"),
        (5, "http://c", "DIFFERENT", "fr"),   # dup url, text varies (fd viol too)
        (6, "ftp://d", "delta", None),        # bad scheme + null lang
        (7, "http://e", None, "de"),          # null text -> expr is NULL
    ]
    return spark.createDataFrame(rows, "id long, url string, text string, lang string")


RULES = [
    ExprRule("http_scheme", "url LIKE 'http%'"),
    ExprRule("text_nonempty", "length(text) > 0"),
    NotNullRule("lang"),
    UniqueRule("url", id_col="id"),
    FDRule("url", deps=("text",)),
]


def _reasons(spark):
    routed = route_rows(_pages(spark), RULES)
    return {r["id"]: sorted(r["quarantine_reasons"]) for r in routed.collect()}


def test_reasons_per_row(spark):
    got = _reasons(spark)
    assert got[1] == []
    assert got[2] == []                       # exemplar of the url-b group
    assert got[3] == ["unique:url"]           # non-exemplar twin
    assert got[4] == ["fd:url"]               # fd poisons the WHOLE group,
    assert got[5] == ["fd:url", "unique:url"]  # exemplar incl.; twin both
    assert got[6] == ["expr:http_scheme", "not_null:lang"]
    # NULL text: length(text) is NULL -> fail-closed
    assert got[7] == ["expr:text_nonempty"]


def test_keep_exemplar_false_quarantines_whole_group(spark):
    rules = [UniqueRule("url", id_col="id", keep_exemplar=False)]
    routed = route_rows(_pages(spark), rules)
    got = {r["id"]: list(r["quarantine_reasons"]) for r in routed.collect()}
    assert got[2] == ["unique:url"] and got[3] == ["unique:url"]
    assert got[1] == []


def test_unique_rule_null_ids_fail_closed(spark):
    """NULL ids in a duplicate group never slip through: a NULL id is
    never the exemplar (id != exemplar would be NULL -> fail-open
    before the fix), and an all-NULL-id group has no deterministic
    exemplar at all, so the whole group quarantines."""
    rows = [
        (5, "http://m"),     # mixed group: real id is the exemplar
        (None, "http://m"),  # ...its NULL twin must quarantine
        (None, "http://n"),  # all-NULL group: no exemplar ->
        (None, "http://n"),  # ...the WHOLE group quarantines
        (1, "http://ok"),    # unique key, NULL-free
        (None, "http://ok2"),  # unique key with NULL id: clean
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    routed = route_rows(df, [UniqueRule("url", id_col="id")])
    got = {
        (r["id"], r["url"]): list(r["quarantine_reasons"])
        for r in routed.collect()
    }
    assert got[(5, "http://m")] == []
    assert got[(None, "http://m")] == ["unique:url"]
    assert got[(None, "http://n")] == ["unique:url"]
    assert got[(1, "http://ok")] == []
    assert got[(None, "http://ok2")] == []


def test_split_partitions_the_table(spark):
    routed = route_rows(_pages(spark), RULES).persist()
    clean, quarantined = split(routed)
    assert {r["id"] for r in clean.collect()} == {1, 2}
    assert "quarantine_reasons" not in clean.columns
    assert quarantined.count() == 5
    assert clean.count() + quarantined.count() == 7
    routed.unpersist()


def test_row_local_rules_need_no_shuffle(spark):
    """expr/not_null-only routing must stay a pure projection: no
    Exchange in the optimized plan."""
    rules = [ExprRule("nonempty", "length(text) > 0"), NotNullRule("lang")]
    routed = route_rows(_pages(spark), rules)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_empty_rules_all_clean(spark):
    routed = route_rows(_pages(spark), [])
    assert routed.filter(F.size("quarantine_reasons") > 0).count() == 0


def test_gopher_rules_route(spark):
    """Gopher §A1 pack: each gate fires on its planted pathology and
    nothing else; a healthy doc sails through; the whole pack stays a
    shuffle-free projection."""
    from data_check_spark.operators.quarantine import gopher_rules

    healthy = "the quick brown fox jumps over the lazy dog " * 10  # 90 words
    rows = [
        (1, healthy),
        (2, "too short"),                                # min_words
        (3, "ab " * 80),                                 # mean word len < 3
        (4, ("superlongword" * 3 + " ") * 80),           # mean word len > 10
        (5, ("12345 67890 ### " * 30)),                  # alpha fraction 0
        (6, "\n".join("- item " + healthy[:20] for _ in range(30))),  # bullets
        (7, "\n".join(healthy[:40] + "..." for _ in range(30))),      # ellipsis
        (8, None),                                       # NULL text
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    routed = route_rows(df, gopher_rules())
    got = {r["id"]: set(r["quarantine_reasons"]) for r in routed.collect()}
    assert got[1] == set()
    assert got[2] == {"expr:gopher_min_words"}
    assert "expr:gopher_min_mean_word_len" in got[3]
    assert "expr:gopher_max_mean_word_len" in got[4]
    assert "expr:gopher_alpha_words" in got[5]
    assert got[6] == {"expr:gopher_bullet_lines"}
    assert got[7] == {"expr:gopher_ellipsis_lines"}
    # NULL text fails every configured gate (fail-closed)
    assert len(got[8]) == len(gopher_rules())
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gopher_gate_optout(spark):
    from data_check_spark.operators.quarantine import gopher_rules

    names = {r.name for r in gopher_rules(min_words=None, max_words=None)}
    assert "gopher_min_words" not in names and "gopher_max_words" not in names
    # stopword gate is opt-in
    assert "gopher_stopwords" not in {r.name for r in gopher_rules()}
    assert "gopher_stopwords" in {
        r.name for r in gopher_rules(min_stopword_ratio=0.05)
    }


def test_runner_route_out(spark, tmp_path):
    """--route-out splits the synth corpus: clean has no NULL
    text/lang and no duplicated urls; quarantine carries reasons;
    the two sides partition the input exactly."""
    from data_check_spark.runner import main

    out = str(tmp_path / "run_route")
    route = str(tmp_path / "routed")
    main([
        "--synthesize", "2000",
        "--out", out,
        "--partitions", "4",
        "--route-out", route,
    ])
    clean = spark.read.parquet(f"{route}/clean")
    quar = spark.read.parquet(f"{route}/quarantine")
    assert clean.count() + quar.count() == 2000
    assert clean.filter(
        F.col("text").isNull() | F.col("lang").isNull()
    ).count() == 0
    dup_urls = clean.groupBy("url").count().filter(F.col("count") > 1)
    assert dup_urls.count() == 0
    # synth plants ~2% dup urls + ~1%/2% null text/lang: dirt exists
    assert quar.count() > 0
    assert quar.filter(F.size("quarantine_reasons") == 0).count() == 0
    reasons = {
        x
        for r in quar.select("quarantine_reasons").collect()
        for x in r["quarantine_reasons"]
    }
    assert {"not_null:text", "not_null:lang", "unique:url"} <= reasons


def test_encoding_rules_route(spark):
    """Each decode-quality gate fires on its own scar; clean ASCII
    passes; NULL text fails every configured gate (fail-closed)."""
    from data_check_spark.operators.quarantine import encoding_rules, route_rows

    rows = [
        (0, "clean ascii"),
        (1, "bad " + chr(0xFFFD)),
        (2, "caf" + chr(0xC3) + chr(0xA9)),
        (3, "ctrl" + chr(1) + "x"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    routed = route_rows(df, encoding_rules())
    got = {r["doc_id"]: set(r["quarantine_reasons"]) for r in routed.collect()}
    assert got[0] == set()
    assert got[1] == {"expr:enc_replacement"}
    assert got[2] == {"expr:enc_mojibake"}
    assert got[3] == {"expr:enc_control"}
    assert len(got[4]) == len(encoding_rules())


def test_encoding_rules_thresholds_and_optout(spark):
    from data_check_spark.operators.quarantine import encoding_rules, route_rows

    # tolerate one replacement char; drop the control gate entirely
    rules = encoding_rules(max_replacement_chars=1, max_control_chars=None)
    assert {r.name for r in rules} == {"enc_replacement", "enc_mojibake"}
    df = spark.createDataFrame(
        [(0, "one " + chr(0xFFFD) + " ok"), (1, chr(0xFFFD) * 2)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: set(r["quarantine_reasons"])
        for r in route_rows(df, rules).collect()
    }
    assert got[0] == set()
    assert got[1] == {"expr:enc_replacement"}
