"""Quarantine routing — split a table into clean rows and quarantined
rows WITH REASONS, for the row-decidable check kinds.

The suite (plans/suite.py) answers "is this table healthy?" with
verdicts and bounded violation DUMPS (500-row samples, the reference's
report limit). A training-data pipeline needs the complementary,
unbounded direction: every row either flows on or lands in quarantine
with the list of rules it broke — the filter-and-quarantine pass that
sits in front of any 100 TB ingest. The reference has no counterpart
(read-only diffing, ``/root/reference/data_check/query/query_bq.py``
returns report frames).

Rules (each contributes one reason label per violating row):

  * ``expr(name, predicate_sql)`` — row fails when the predicate is
    FALSE **or NULL** (fail-closed, ExprCheck's convention).
  * ``not_null(col)`` — row fails when the column is NULL.
  * ``unique(key, id_col)`` — rows whose key value occurs more than
    once fail, EXCEPT the group's exemplar (min ``id_col`` — the
    deterministic survivor dedup keeps); pass ``keep_exemplar=False``
    to quarantine whole groups (validation stance: which copy is
    right is unknown).
  * ``fd(key, deps)`` — rows in groups where the dependent columns
    vary fail as a group (the url -> byte-identical text invariant;
    no member can be trusted).

Output: ONE DataFrame = input columns + ``quarantine_reasons``
(sorted array, empty = clean). ``split()`` filters it into the
(clean, quarantined) pair; both filters share the routed plan, so
persist the routed frame (or write it once and filter the sink) rather
than recomputing per sink.

Plan shape (100 TB):
  * expr/not_null rules are pure per-row projections — zero shuffle,
    whole-stage codegen, no Python.
  * unique/fd rules aggregate (key -> flag) frames — shuffled on the
    key with map-side combine, so the exchange carries one row per
    distinct key per task — then hash-join back on the key. The
    violating-key set is bounded by the VIOLATION rate, not the table;
    on the common mostly-clean table it broadcasts
    (``broadcast='auto'`` probes plan size like operators/refint.py);
    on a pathological table it falls back to a shuffled join rather
    than exceeding the broadcast ceiling.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_check_spark.operators.refint import maybe_broadcast


@dataclass(frozen=True)
class ExprRule:
    name: str
    predicate_sql: str


@dataclass(frozen=True)
class ColumnRule:
    """ExprRule's programmatic twin: the predicate is a Column
    expression instead of a SQL string, so rule packs can reuse the
    canonical metric definitions (functions/textstats.py) instead of
    re-deriving them as SQL. Same semantics and reason label
    (``expr:{name}``): FALSE **or NULL** quarantines (fail-closed)."""
    name: str
    predicate: Column


@dataclass(frozen=True)
class NotNullRule:
    column: str


@dataclass(frozen=True)
class UniqueRule:
    key: str
    id_col: str
    keep_exemplar: bool = True


@dataclass(frozen=True)
class FDRule:
    key: str
    deps: tuple


def route_rows(
    df: DataFrame,
    rules: list,
    *,
    broadcast: bool | str = "auto",
) -> DataFrame:
    """Attach ``quarantine_reasons`` (sorted array<string>, empty =
    clean) to every row of ``df`` per the given rules. Row-local rules
    cost zero shuffles; each unique/fd rule costs one key-aggregation
    + one join back (broadcast when the violating-key frame is small,
    per ``broadcast``: True / False / 'auto')."""
    reason_cols: list[Column] = []
    out = df
    for i, rule in enumerate(rules):
        tag = f"_qr_{i}"
        if isinstance(rule, (ExprRule, ColumnRule)):
            pred = (
                F.expr(rule.predicate_sql)
                if isinstance(rule, ExprRule)
                else rule.predicate
            )
            fails = ~F.coalesce(pred, F.lit(False))  # NULL predicate fails
            out = out.withColumn(tag, F.when(fails, F.lit(f"expr:{rule.name}")))
        elif isinstance(rule, NotNullRule):
            out = out.withColumn(
                tag,
                F.when(
                    F.col(rule.column).isNull(),
                    F.lit(f"not_null:{rule.column}"),
                ),
            )
        elif isinstance(rule, UniqueRule):
            grp = df.groupBy(F.col(rule.key).alias("_k")).agg(
                F.count(F.lit(1)).alias("_n"),
                F.min(rule.id_col).alias("_exemplar"),
            )
            dup_keys = grp.filter(F.col("_n") > 1).select(
                "_k", "_exemplar", F.lit(True).alias("_dup")
            )
            out = out.join(
                maybe_broadcast(dup_keys, broadcast),
                on=out[rule.key].eqNullSafe(dup_keys["_k"]),
                how="left",
            ).drop("_k")
            is_member = F.coalesce(F.col("_dup"), F.lit(False))
            fails = (
                # fail-closed on NULL ids: a NULL id is never the
                # exemplar (min skips NULLs), and a group whose ids
                # are ALL NULL has no deterministic exemplar at all —
                # quarantine it whole rather than let `id != NULL`
                # evaluate to NULL and pass every member through
                is_member
                & (
                    F.col("_exemplar").isNull()
                    | ~F.col(rule.id_col).eqNullSafe(F.col("_exemplar"))
                )
                if rule.keep_exemplar
                else is_member
            )
            out = out.withColumn(
                tag, F.when(fails, F.lit(f"unique:{rule.key}"))
            ).drop("_exemplar", "_dup")
        elif isinstance(rule, FDRule):
            dep_struct = F.struct(*[F.col(c) for c in rule.deps])
            grp = df.groupBy(F.col(rule.key).alias("_k")).agg(
                F.count_distinct(dep_struct).alias("_nv")
            )
            bad_keys = grp.filter(F.col("_nv") > 1).select("_k")
            out = out.join(
                maybe_broadcast(bad_keys.withColumn("_fdbad", F.lit(True)), broadcast),
                on=out[rule.key].eqNullSafe(bad_keys["_k"]),
                how="left",
            ).drop("_k")
            out = out.withColumn(
                tag,
                F.when(F.col("_fdbad").isNotNull(), F.lit(f"fd:{rule.key}")),
            ).drop("_fdbad")
        else:
            raise TypeError(f"unknown rule: {rule!r}")
        reason_cols.append(F.col(tag))
    reasons = F.array_sort(
        F.filter(F.array(*reason_cols), lambda x: x.isNotNull())
    ) if reason_cols else F.array().cast("array<string>")
    return out.withColumn("quarantine_reasons", reasons).drop(
        *[f"_qr_{i}" for i in range(len(rules))]
    )


def gopher_rules(
    text_col: str = "text",
    *,
    min_words: int | None = 50,
    max_words: int | None = 100_000,
    min_mean_word_len: float | None = 3.0,
    max_mean_word_len: float | None = 10.0,
    min_alpha_word_fraction: float | None = 0.80,
    min_stopword_ratio: float | None = None,
    max_bullet_line_fraction: float | None = 0.90,
    max_ellipsis_line_fraction: float | None = 0.30,
) -> list:
    """The Gopher §A1 document-quality gates (Rae et al. 2021,
    arXiv:2112.11446) as a ``route_rows`` rule pack — the standard
    pre-training curation filter, built from the canonical metric
    expressions in functions/textstats.py so the router and the
    metric queries can never drift apart. Every gate is a pure JVM
    HOF over one text column: the whole pack routes in a single
    shuffle-free projection (route_rows' expr path). Pass None to
    drop a gate; defaults follow the paper except stopword_ratio
    (opt-in: Gopher's form is "≥2 distinct stop words", ours is a
    ratio — close but not identical, so it isn't defaulted on).
    NULL text fails every configured gate (fail-closed)."""
    from data_check_spark.functions.textstats import (
        alpha_word_fraction,
        bullet_line_fraction,
        ellipsis_line_fraction,
        mean_word_length,
        stopword_ratio,
        token_count,
    )

    t = F.col(text_col)
    rules: list = []
    n_tok = token_count(t).cast("double")
    if min_words is not None:
        rules.append(ColumnRule("gopher_min_words", n_tok >= float(min_words)))
    if max_words is not None:
        rules.append(ColumnRule("gopher_max_words", n_tok <= float(max_words)))
    mwl = mean_word_length(t)
    if min_mean_word_len is not None:
        rules.append(
            ColumnRule("gopher_min_mean_word_len", mwl >= float(min_mean_word_len))
        )
    if max_mean_word_len is not None:
        rules.append(
            ColumnRule("gopher_max_mean_word_len", mwl <= float(max_mean_word_len))
        )
    if min_alpha_word_fraction is not None:
        rules.append(
            ColumnRule(
                "gopher_alpha_words",
                alpha_word_fraction(t) >= float(min_alpha_word_fraction),
            )
        )
    if min_stopword_ratio is not None:
        rules.append(
            ColumnRule(
                "gopher_stopwords",
                stopword_ratio(t) >= float(min_stopword_ratio),
            )
        )
    if max_bullet_line_fraction is not None:
        rules.append(
            ColumnRule(
                "gopher_bullet_lines",
                # fraction is NULL when no non-blank lines exist: a
                # lineless-but-present doc has no bullet problem
                # (passes); NULL text still fails (fail-closed)
                F.coalesce(
                    bullet_line_fraction(t)
                    <= float(max_bullet_line_fraction),
                    t.isNotNull(),
                ),
            )
        )
    if max_ellipsis_line_fraction is not None:
        rules.append(
            ColumnRule(
                "gopher_ellipsis_lines",
                F.coalesce(
                    ellipsis_line_fraction(t)
                    <= float(max_ellipsis_line_fraction),
                    t.isNotNull(),
                ),
            )
        )
    return rules


def encoding_rules(
    text_col: str = "text",
    *,
    max_replacement_chars: int | None = 0,
    max_mojibake: int | None = 0,
    max_control_chars: int | None = 0,
) -> list:
    """Decode-quality gates for web-crawl text as a ``route_rows``
    rule pack: U+FFFD replacement chars (decode failures), UTF-8-as-
    Latin-1 mojibake digraphs and C0 control chars, built from the
    canonical counters in functions/textstats.py so the router and
    the ``encoding_scan`` metrics can never drift apart. Defaults are
    zero-tolerance (any scar quarantines); raise a threshold to
    tolerate isolated artifacts, pass None to drop a gate. Pure JVM
    string built-ins — the whole pack routes in one shuffle-free
    projection. NULL text fails every configured gate (fail-closed,
    same contract as gopher_rules)."""
    from data_check_spark.functions.textstats import (
        control_char_count,
        mojibake_count,
        replacement_char_count,
    )

    t = F.col(text_col)
    rules: list = []
    if max_replacement_chars is not None:
        rules.append(
            ColumnRule(
                "enc_replacement",
                replacement_char_count(t) <= int(max_replacement_chars),
            )
        )
    if max_mojibake is not None:
        rules.append(
            ColumnRule("enc_mojibake", mojibake_count(t) <= int(max_mojibake))
        )
    if max_control_chars is not None:
        rules.append(
            ColumnRule(
                "enc_control", control_char_count(t) <= int(max_control_chars)
            )
        )
    return rules


def split(routed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) from a ``route_rows`` output. Both share
    the routed plan — persist it (or write it once) before consuming
    both sides, or the router recomputes per sink."""
    is_clean = F.size("quarantine_reasons") == 0
    clean = routed.filter(is_clean).drop("quarantine_reasons")
    return clean, routed.filter(~is_clean)
