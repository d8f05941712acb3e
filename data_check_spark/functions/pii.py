"""PII scanning and redaction for training-data pipelines: count and
scrub emails, URLs, and IPv4 addresses in a text column.

All JVM-side ``regexp_count`` / ``regexp_replace`` — no Python
workers; selecting every counter plus the redacted text stays one
scan (independent regexes, each evaluated once per row inside
whole-stage codegen). Patterns deliberately use only the regex subset
that Java's engine and RE2-family engines (DuckDB, Go, Hyperscan)
interpret identically — character classes, bounded quantifiers, and
ASCII word boundaries; no backreferences or lookarounds — so counts
are reproducible across engines (the oracle re-derives them in
DuckDB) and the patterns can ride a scale-out rewrite to any engine.

Redaction order is emails → URLs → IPv4: an email eaten first cannot
leave an ``@``-less host behind for the URL pass to misread, and
URL paths are scrubbed before the IP pass so an IP inside a URL is
redacted as part of the URL, not double-counted.

Recall here is the honest regex tier (dictionary names, free-form
phone formats, and contextual PII need an NER model — that belongs
behind the same mapInPandas seam as multimodal decode). The reference
engine has no PII tooling (/root/reference/data_check/, validation
only); beyond-reference training-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# NOTE: these are the patterns as the regex ENGINE sees them (what
# F.lit()/DuckDB string literals pass through verbatim). Embedding one
# in a Spark SQL string literal (ExprCheck predicate_sql, spark.sql)
# requires doubling the backslashes — Spark SQL processes backslash
# escapes inside quoted literals (tests/test_suite.py PII-gate test).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# class includes ?=& (query strings are a prime PII carrier — reset
# tokens, ids), : (ports), # (fragments), ~ + @ (user dirs, encoded
# spaces, rare embedded creds): stopping at '?' would leave
# '?token=SECRET' behind in the redacted text. Trailing prose
# punctuation ('?', '.') can over-capture — the safe direction for a
# redactor.
URL_RE = r"https?://[A-Za-z0-9./_%?=&:#~+@-]+"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_KINDS = (("email", EMAIL_RE), ("url", URL_RE), ("ipv4", IPV4_RE))


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts: ``{'email': …, 'url': …, 'ipv4': …}``."""
    return {kind: F.regexp_count(col, F.lit(pat)) for kind, pat in _KINDS}


def redact_pii(col: Column) -> Column:
    """The text with every match replaced by ``<EMAIL>`` / ``<URL>`` /
    ``<IPV4>``, applied in that order (see module docstring)."""
    out = col
    for kind, pat in _KINDS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out
