"""functions/html: html → text extraction — cross-engine byte-identity
(Spark Column vs Spark-SQL dialect vs DuckDB dialect vs a pure-Python
re-based reference), the BINARY decode leg, NULL propagation, and the
declarative ExprCheck form of the input_hint invariant over the synth
pages table."""

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from data_check_spark.functions.html import (
    _ENTITIES,
    _STRIP_RES,
    _WS_RE,
    html_to_text,
    html_to_text_from_binary,
    html_to_text_sql,
)

CASES = [
    None,
    "",
    "plain text no markup",
    "<html><body>hello world</body></html>",
    "<HTML><BODY class='x'>Upper <B>bold</B></BODY></HTML>",
    "<p>a<br>b<br/>c</p>",
    "<script>var x = '<p>not text</p>';</script>visible"
    '<style type="text/css">p{color:red}</style>',
    "<SCRIPT SRC='x.js'>if (a<b) {}</SCRIPT>after",
    "<!-- hidden <b>comment</b> -->shown<!---->",
    "tabs\tand\nnewlines\r\nand\fFF   spaces",
    "&lt;tag&gt; &amp; &quot;quoted&quot; &#39;sq&#39; &apos;ap&apos; a&nbsp;b",
    "&amp;lt; single-pass decode",
    '<a title="a>b">early close</a>',  # documented regex limit — must be symmetric
    "<script>unclosed body",  # documented regex limit — must be symmetric
    "<div><p>nested <span>deep</span></p></div>",
    "  leading and trailing  ",
    "<p>unicode café 中文 emoji \U0001f600</p>",
    "<td>a</td><td>b</td>",
    "mixed &amp; <b>bold &lt;x&gt;</b> end",
]


def py_ref(s):
    """The extraction pipeline re-derived with Python's re — the
    third, independent implementation the engines must both match."""
    if s is None:
        return None
    for pat in _STRIP_RES:
        s = re.sub(pat, " ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return re.sub(_WS_RE, " ", s).strip(" ")


def _duck_extract(values):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, h VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(values)))
    expr = html_to_text_sql("h", "duckdb")
    return dict(con.execute(f"SELECT i, {expr} FROM t").fetchall())


def test_cross_engine_byte_identity(spark):
    df = spark.createDataFrame(list(enumerate(CASES)), "i int, h string")
    col_out = {r["i"]: r["t"] for r in df.select("i", html_to_text("h").alias("t")).collect()}
    sql_out = {
        r["i"]: r["t"]
        for r in df.selectExpr("i", html_to_text_sql("h", "spark") + " AS t").collect()
    }
    duck_out = _duck_extract(CASES)
    for i, c in enumerate(CASES):
        exp = py_ref(c)
        assert col_out[i] == exp, (i, c, col_out[i], exp)
        assert sql_out[i] == exp, (i, c, sql_out[i], exp)
        assert duck_out[i] == exp, (i, c, duck_out[i], exp)


def test_randomized_cross_engine(spark):
    """Deterministic pseudo-random html-ish strings (tag soup, stray
    brackets, entities, whitespace runs) through all four paths."""
    import random

    rng = random.Random(20250820)
    frags = [
        "word", " ", "\t", "\n", "<p>", "</p>", "<b class='x'>", "</b>",
        "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
        "&amp;", "&lt;", "&nbsp;", "<", ">", "&", "café", "<br/>", "x=1",
    ]
    cases = ["".join(rng.choice(frags) for _ in range(rng.randint(0, 30))) for _ in range(120)]
    df = spark.createDataFrame(list(enumerate(cases)), "i int, h string")
    col_out = {r["i"]: r["t"] for r in df.select("i", html_to_text("h").alias("t")).collect()}
    duck_out = _duck_extract(cases)
    for i, c in enumerate(cases):
        exp = py_ref(c)
        assert col_out[i] == exp, (i, c, col_out[i], exp)
        assert duck_out[i] == exp, (i, c, duck_out[i], exp)


def test_binary_decode_leg(spark):
    df = spark.createDataFrame(
        [(1, "<p>round trip ok</p>".encode()), (2, None)], "i int, h binary"
    )
    out = {r["i"]: r["t"] for r in df.select("i", html_to_text_from_binary("h").alias("t")).collect()}
    assert out == {1: "round trip ok", 2: None}


def test_sql_dialect_guard():
    with pytest.raises(ValueError):
        html_to_text_sql("h", "postgres")


def test_pages_invariant_exprcheck(spark):
    """The input_hint invariant as a declarative check: on the synth
    pages table, extraction of the html payload must equal the stored
    text's (trimmed, collapsed) 64-char prefix for every row with
    non-NULL html — asserted through ExprCheck riding the fused stats
    pass, zero violations expected; then the predicate is broken on
    purpose to prove the check actually fails."""
    from data_check_spark.plans.suite import CheckSuite, ExprCheck
    from data_check_spark.sources.synth import synth_pages

    pages = synth_pages(spark, 4000, partitions=4).withColumn(
        "part", F.pmod(F.xxhash64("url"), F.lit(4)).cast("string")
    )
    pred = (
        "html IS NULL OR "
        + html_to_text_sql("CAST(html AS STRING)", "spark")
        + " = trim(regexp_replace(substring(text, 1, 64), '"
        + _WS_RE
        + "', ' '))"
    )
    suite = CheckSuite([ExprCheck("html_text_invariant", pred)])
    verdicts = suite.run(spark, pages, "part").verdicts
    rows = verdicts.filter(
        (F.col("check") == "expr") & (F.col("column") == "html_text_invariant")
    ).collect()
    assert len(rows) == 4 and all(r["passed"] for r in rows)

    broken = CheckSuite([ExprCheck("always_off", "substring(text,1,1) = 'Z'")])
    v2 = broken.run(spark, pages.filter(F.col("text").isNotNull()), "part").verdicts
    rows2 = v2.filter(
        (F.col("check") == "expr") & (F.col("column") == "always_off")
    ).collect()
    assert len(rows2) == 4 and not any(r["passed"] for r in rows2)


def test_invalid_utf8_decode_is_lossy_not_fatal(spark):
    """Pins the documented decode-leg asymmetry: Spark's binary→string
    cast replaces invalid bytes with U+FFFD and extraction proceeds
    (DuckDB's decode() would raise — the oracle only decodes
    well-formed pages); the scarred rows are exactly what the
    quarantine encoding pack's zero-tolerance U+FFFD rule routes."""
    df = spark.createDataFrame(
        [(1, b"<p>ok \xff\xfe bad</p>")], "i int, h binary"
    )
    [r] = df.select(html_to_text_from_binary("h").alias("t")).collect()
    assert r["t"] == "ok �� bad"
