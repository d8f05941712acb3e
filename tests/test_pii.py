"""PII scan/redact: counts on crafted strings, redaction order (an IP
inside a URL is part of the URL, not double-redacted), engine-portable
pattern subset, null passthrough."""

import pytest
from pyspark.sql import functions as F

from data_check_spark.functions.pii import pii_counts, redact_pii


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "mail me at jane.doe+spam@sub.example.co.uk or bob@x.io today"),
        (2, "served from 10.0.0.7 and 192.168.1.255, port ignored"),
        (3, "see https://example.org/a/b_c-d%20e and http://plain.example.com"),
        (4, "ip-in-url https://10.1.2.3/path stays one URL"),
        (5, "clean text with no identifiers at all"),
        (6, None),
        (7, "not@anemail (no tld) and 999.999.999.999 is still ipv4-shaped"),
    ]
    return spark.createDataFrame(rows, "id bigint, t string")


def _row(df, i):
    c = pii_counts(F.col("t"))
    out = df.filter(F.col("id") == i).select(
        c["email"].alias("e"), c["url"].alias("u"), c["ipv4"].alias("ip"),
        redact_pii(F.col("t")).alias("r"),
    )
    return out.collect()[0]


def test_email_counts(df):
    r = _row(df, 1)
    assert (r["e"], r["u"], r["ip"]) == (2, 0, 0)
    assert r["r"] == "mail me at <EMAIL> or <EMAIL> today"


def test_ipv4_counts(df):
    r = _row(df, 2)
    assert (r["e"], r["u"], r["ip"]) == (0, 0, 2)
    assert r["r"] == "served from <IPV4> and <IPV4>, port ignored"


def test_url_counts(df):
    r = _row(df, 3)
    assert (r["e"], r["u"], r["ip"]) == (0, 2, 0)
    assert "<URL>" in r["r"] and "example" not in r["r"]


def test_ip_inside_url_redacts_as_url(df):
    r = _row(df, 4)
    # counted by both regexes on the raw text, but redaction order
    # consumes the URL (and the IP inside it) in one replacement
    assert r["u"] == 1 and r["ip"] == 1
    assert r["r"] == "ip-in-url <URL> stays one URL"
    assert "<IPV4>" not in r["r"]


def test_query_string_redacts_with_url(spark):
    """Query strings are a prime PII carrier: the URL class includes
    ?=&:#~+@ so a reset token never survives redaction."""
    rows = [(1, "go to https://x.com/reset?token=SECRET123&u=7 now"),
            (2, "port http://a.com:8080/p#frag kept")]
    d = spark.createDataFrame(rows, "id bigint, t string")
    got = {r["id"]: r for r in d.select(
        "id", redact_pii(F.col("t")).alias("r"),
        pii_counts(F.col("t"))["url"].alias("u")).collect()}
    assert got[1]["r"] == "go to <URL> now" and got[1]["u"] == 1
    assert "SECRET123" not in got[1]["r"]
    assert got[2]["r"] == "port <URL> kept" and got[2]["u"] == 1


def test_clean_text(df):
    r = _row(df, 5)
    assert (r["e"], r["u"], r["ip"]) == (0, 0, 0)
    assert r["r"] == "clean text with no identifiers at all"


def test_null_passthrough(df):
    r = _row(df, 6)
    assert r["e"] is None and r["r"] is None


def test_regex_tier_is_honest(df):
    # documented recall limits: no-TLD strings don't count as emails;
    # 999.x octets DO count (the regex tier doesn't range-check)
    r = _row(df, 7)
    assert r["e"] == 0 and r["ip"] == 1


def test_matches_duckdb_semantics(spark, df):
    """The same patterns run through DuckDB's RE2 must agree count-
    for-count — the cross-engine claim the module makes."""
    import duckdb

    from data_check_spark.functions.pii import EMAIL_RE, IPV4_RE, URL_RE

    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"""SELECT id,
              CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) e,
              CAST(len(regexp_extract_all(t, '{URL_RE}')) AS INT) u,
              CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS INT) ip
            FROM t WHERE t IS NOT NULL ORDER BY id"""
    ).fetchall()
    c = pii_counts(F.col("t"))
    got = [
        (r["id"], r["e"], r["u"], r["ip"])
        for r in df.filter(F.col("t").isNotNull())
        .select("id", c["email"].alias("e"), c["url"].alias("u"), c["ipv4"].alias("ip"))
        .orderBy("id")
        .collect()
    ]
    assert got == [tuple(w) for w in want]
