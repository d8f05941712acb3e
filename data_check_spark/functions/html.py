"""HTML → text extraction — the per-row transform behind the
BASELINE.json input_hint invariant ("byte-identical extracted text
per url"), as pure JVM column expressions.

Motivation: the input table carries ``html BINARY`` alongside
``text STRING``; a validation engine that can only *compare* stored
text cannot assert the stronger invariant that the stored text IS the
extraction of the stored html. This module provides the extraction as
a deterministic, engine-portable transform so the invariant becomes a
checkable equality — ``html_to_text(html) = expected(text)`` — via
ExprCheck / fd_violations / a plain filter, on either engine.

Extraction pipeline (fixed order; each step total and deterministic):

1. UTF-8 decode of the binary payload (``CAST(html AS STRING)`` on
   Spark, ``decode(html)`` on DuckDB — done by the caller or the
   ``*_from_binary`` helpers so the core works on strings).
2. Drop ``<script>…</script>`` and ``<style>…</style>`` blocks
   (case-insensitive, dot-matches-newline, lazy) — their contents are
   code, not text.
3. Drop ``<!-- … -->`` comments.
4. Replace every remaining tag ``<[^>]*>`` with a single space (tags
   are word boundaries: ``a<br>b`` → ``a b``, not ``ab``).
5. Decode the HTML entities that appear in text-bearing markup:
   ``&lt; &gt; &quot; &#39; &apos; &nbsp;`` then — LAST, so
   ``&amp;lt;`` correctly yields the literal ``&lt;`` — ``&amp;``.
   (Single-pass decode; full numeric-reference decoding is a
   per-document-charset concern out of scope for a validator.)
6. Collapse runs of HTML whitespace (space, TAB, LF, FF, CR) to one
   space and trim — the canonical inter-word form.

Known regex-extraction limits (identical on both engines, so parity
holds): a ``>`` inside a QUOTED attribute value terminates the tag
early; an unclosed ``<script>`` leaves its body as text. Real parsers
(lxml/bs4) handle these; they are Python-per-row and not available
in this container — the regex subset is the deliberate JVM-side
trade, and the limits are symmetric across engines.

Invalid-UTF-8 caveat (the ONE decode-leg asymmetry, pinned by test):
Spark's ``CAST(binary AS STRING)`` lossily replaces each invalid byte
with U+FFFD and extraction proceeds; DuckDB's ``decode()`` raises
instead. The oracle twin only ever decodes well-formed pages, so
parity holds there; on a real crawl, route mojibake rows FIRST with
the zero-tolerance U+FFFD rule (operators/quarantine encoding pack —
it catches exactly the rows Spark's lossy decode would scar) and run
the extraction invariant on the clean side.

Engine-portable by construction (contract shared with functions/urls
and functions/splits): every pattern lives in the Java∩RE2 regex
subset — inline ``(?is)`` flags, lazy ``.*?``, no backreferences, no
lookaround, no backslash classes (the whitespace class is built from
literal control characters so Spark-SQL backslash escaping and DuckDB
literal backslashes cannot diverge).

Scale: one map-only Project per row — four regexp_replace + seven
replace + one trim, no shuffle, no Python workers, one
WholeStageCodegen span. At 10^12 rows this is scan-bound.

Reference parity note: the reference compares stored values only
(``cast(col AS string)`` — ``/root/reference/data_check/processors/
bigquery.py:112-115``); deriving the text side of the comparison from
the raw html payload is beyond-reference surface for the web-text
payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java∩RE2-safe patterns; no quotes, no backslashes (SQL-literal safe).
_SCRIPT_RE = "(?is)<script[^>]*>.*?</script[^>]*>"
_STYLE_RE = "(?is)<style[^>]*>.*?</style[^>]*>"
_COMMENT_RE = "(?s)<!--.*?-->"
_TAG_RE = "<[^>]*>"
# HTML whitespace (space TAB LF FF CR) as LITERAL characters — never
# backslash escapes, which Spark SQL would interpret and DuckDB would
# pass through, silently diverging.
_WS_RE = "[ \t\n\f\r]+"

# single-pass entity decode; &amp; LAST so "&amp;lt;" -> "&lt;" (the
# literal four characters), matching a one-pass spec decoder.
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_STRIP_RES = (_SCRIPT_RE, _STYLE_RE, _COMMENT_RE, _TAG_RE)


def html_to_text(col: Column | str) -> Column:
    """Extract visible text from an html STRING column (decode binary
    first: ``html_to_text_from_binary`` or ``.cast("string")``).
    NULL html → NULL text (every step is NULL-propagating)."""
    s = F.col(col) if isinstance(col, str) else col
    for pat in _STRIP_RES:
        s = F.regexp_replace(s, pat, " ")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, _WS_RE, " "))


def html_to_text_from_binary(col: Column | str) -> Column:
    """`html_to_text` over a BINARY column (UTF-8 decode first)."""
    s = F.col(col) if isinstance(col, str) else col
    return html_to_text(s.cast("string"))


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def html_to_text_sql(col: str, dialect: str = "duckdb") -> str:
    """The SAME extraction as a SQL expression over a string-typed
    ``col`` — the oracle twin (pattern: functions/urls.canonical_url_sql).
    ``dialect="duckdb"`` appends the ``'g'`` option DuckDB needs for
    global replacement; ``dialect="spark"`` omits it (Spark SQL
    regexp_replace is global by default) so the expression drops into
    ExprCheck predicates. Kept next to the Spark expression so the
    two stay in lockstep."""
    if dialect not in ("duckdb", "spark"):
        raise ValueError(f"unknown dialect: {dialect!r}")
    g = ", 'g'" if dialect == "duckdb" else ""
    s = col
    for pat in _STRIP_RES:
        s = f"regexp_replace({s}, {_sql_quote(pat)}, ' '{g})"
    for ent, ch in _ENTITIES:
        s = f"replace({s}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    return f"trim(regexp_replace({s}, {_sql_quote(_WS_RE)}, ' '{g}))"
