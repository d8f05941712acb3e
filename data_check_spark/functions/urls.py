"""URL canonicalization — the normalization pass a web-scale corpus
runs before url-keyed dedup / uniqueness / FD checks, as pure JVM
column expressions.

Motivation: Common-Crawl-style tables key everything by ``url``
(BASELINE.json input_hint), but raw WARC urls carry crawl noise —
uppercase scheme/host, default ports, fragments, tracking query
params, unsorted param order — that splinters one logical page into
many keys. Canonicalize FIRST, then run UniquenessCheck /
FunctionalDependencyCheck / dedup on the canonical key.

Engine-portable by construction (the same contract as functions/pii
and functions/splits): every step is lower/regexp_extract/split/
filter/sort/join over the Java∩RE2∩DuckDB-compatible regex subset, so
the DuckDB oracle re-derives every canonical url byte-identically and
the operation is auditable outside Spark.

Canonical form (RFC 3986 normalizations + the crawl-specific ones):

1. scheme and host lowercased (userinfo, if any, is preserved as-is
   inside the authority — rare in crawl data);
2. default ports stripped (``:80`` for http, ``:443`` for https);
3. fragment dropped;
4. empty path → ``/``;
5. tracking params removed (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``mc_eid``, ``igshid``, ``ref_src`` by default —
   override with ``drop_params_re``);
6. remaining query params sorted bytewise (param ORDER is
   insignificant for ~all real handlers; sorting merges
   ``?a=1&b=2`` with ``?b=2&a=1``);
7. trailing ``?`` dropped when the query is empty after (5).

NOT done (explicitly, the lossy normalizations that need site
knowledge): percent-encoding case/decode normalization, path dot-
segment removal, ``www.`` stripping, session-id params, trailing-
slash folding. Those change which DISTINCT resource a url names;
callers opt in with their own post-pass.

Scale: one map-only Project per row — no shuffle, no Python workers,
one WholeStageCodegen span. At 10^12 rows this is free relative to
any keyed operation that follows it.

Reference parity note: the reference normalizes compared values by
``cast(col AS string)`` only (``/root/reference/data_check/processors/
bigquery.py:112-115``); url canonicalization is beyond-reference
surface for the web-text payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# default tracking params to drop: anchored full-param-name match,
# applied to the "name=value" token (Java∩RE2∩DuckDB-safe)
DEFAULT_DROP_PARAMS_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid|ref_src)(=.*)?$"

# authority = everything between "://" and the first /?#
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
# path+query = from after the authority to the fragment (or end)
_REST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"


def _host_lowered(auth: Column) -> Column:
    """Authority with ONLY host[:port] lowercased: userinfo (up to the
    last '@') is case-sensitive per RFC 3986 §3.2.1 and preserved —
    lowercasing it would merge urls naming different credentials."""
    return F.concat(
        F.when(
            auth.contains("@"),
            F.concat(F.regexp_extract(auth, "^(.*)@", 1), F.lit("@")),
        ).otherwise(F.lit("")),
        F.lower(F.regexp_extract(auth, "([^@]*)$", 1)),
    )


def _canon_from_parts(
    u: Column,
    scheme: Column,
    auth0: Column,
    rest: Column,
    drop_params_re: str,
) -> Column:
    """Compose the canonical url from the three staged extractions —
    the ONE copy of steps 2-7 both Spark variants share (a fix here
    is a fix in both; canonical_url_sql mirrors it for DuckDB)."""
    # default-port strip is scheme-conditional
    auth = F.when(
        (scheme == "http") & auth0.endswith(":80"),
        F.substring(auth0, F.lit(1), F.length(auth0) - 3),
    ).when(
        (scheme == "https") & auth0.endswith(":443"),
        F.substring(auth0, F.lit(1), F.length(auth0) - 4),
    ).otherwise(auth0)
    path0 = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    rawq = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != "") & ~p.rlike(drop_params_re),
        )
    )
    query = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(u.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(u.rlike(_SCHEME_RE), canon).otherwise(u)
    )


def canonical_url(
    url: Column | str,
    drop_params_re: str = DEFAULT_DROP_PARAMS_RE,
) -> Column:
    """Canonical form of an absolute http(s)-style url (see module
    docstring for the exact normalization set). Rows that do not look
    like ``scheme://authority...`` are returned UNCHANGED rather than
    NULLed — a validation engine must not destroy the evidence it is
    about to flag; pair with an ExprCheck on the shape if malformed
    urls should fail the suite. NULL stays NULL."""
    u = F.col(url) if isinstance(url, str) else url
    return _canon_from_parts(
        u,
        F.lower(F.regexp_extract(u, _SCHEME_RE, 1)),
        _host_lowered(F.regexp_extract(u, _AUTH_RE, 1)),
        F.regexp_extract(u, _REST_RE, 1),  # path[?query], no fragment
        drop_params_re,
    )


def add_canonical_url(
    df,
    url_col: str = "url",
    out_col: str = "url_canon",
    drop_params_re: str = DEFAULT_DROP_PARAMS_RE,
):
    """Hot-path form: materialize the shared regex subtrees (scheme /
    authority / rest) ONCE in a lower Project before composing — the
    same two-stage shape as functions/textstats.add_text_metrics
    (CollapseProject re-evaluates multiply-referenced non-cheap
    aliases when the composition is written as one select). Returns
    df + ``out_col``."""
    u = F.col(url_col)
    staged = df.withColumns(
        {
            "_cu_scheme": F.lower(F.regexp_extract(u, _SCHEME_RE, 1)),
            "_cu_auth": _host_lowered(F.regexp_extract(u, _AUTH_RE, 1)),
            "_cu_rest": F.regexp_extract(u, _REST_RE, 1),
        }
    )
    out = _canon_from_parts(
        u, F.col("_cu_scheme"), F.col("_cu_auth"), F.col("_cu_rest"), drop_params_re
    )
    return staged.withColumn(out_col, out).drop("_cu_scheme", "_cu_auth", "_cu_rest")


def canonical_url_sql(col: str, drop_params_re: str = DEFAULT_DROP_PARAMS_RE) -> str:
    """The SAME canonicalization as DuckDB SQL — the oracle twin
    (pattern: functions/splits.split_label_sql). Kept next to the
    Spark expression so the two stay in lockstep."""
    scheme = f"lower(regexp_extract({col}, '{_SCHEME_RE}', 1))"
    auth_raw = f"regexp_extract({col}, '{_AUTH_RE}', 1)"
    # only host[:port] lowercases; userinfo (before the last '@') is
    # case-sensitive and preserved — mirrors _host_lowered
    auth0 = (
        f"(CASE WHEN contains({auth_raw}, '@') "
        f"THEN regexp_extract({auth_raw}, '^(.*)@', 1) || '@' ELSE '' END "
        f"|| lower(regexp_extract({auth_raw}, '([^@]*)$', 1)))"
    )
    auth = (
        f"CASE WHEN {scheme} = 'http' AND {auth0} LIKE '%:80' "
        f"THEN left({auth0}, length({auth0}) - 3) "
        f"WHEN {scheme} = 'https' AND {auth0} LIKE '%:443' "
        f"THEN left({auth0}, length({auth0}) - 4) ELSE {auth0} END"
    )
    rest = f"regexp_extract({col}, '{_REST_RE}', 1)"
    path = f"(CASE WHEN regexp_extract({rest}, '^([^?]*)', 1) = '' THEN '/' ELSE regexp_extract({rest}, '^([^?]*)', 1) END)"
    rawq = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    kept = (
        f"list_sort(list_filter(string_split({rawq}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{drop_params_re}')))"
    )
    # DuckDB's array_to_string returns NULL (not '') on an EMPTY list
    # — every no-query / all-params-dropped url hits this
    query = f"coalesce(array_to_string({kept}, '&'), '')"
    canon = (
        f"({scheme} || '://' || {auth} || {path} || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END)"
    )
    return (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN regexp_matches({col}, '{_SCHEME_RE}') THEN {canon} "
        f"ELSE {col} END"
    )
