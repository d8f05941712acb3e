"""Corpus-level line / sentence deduplication — the CCNet /
RefinedWeb boilerplate-removal signal (Wenzek et al. 2020 "CCNet";
Penedo et al. 2023 "RefinedWeb"): a line (or sentence) that recurs
across many DOCUMENTS is navigation chrome, cookie banners, footers —
template noise, not content — and the standard curation move is to
count each normalized line's document frequency over the whole corpus
and drop lines above a threshold. Distinct from both
functions/textstats.repetition_metrics (within-document repetition)
and operators/dedup.cross_doc_ngram_duplicates (fixed-width n-gram
spans): the unit here is the natural line/sentence segment and the
output includes the cleaned corpus, not just a diagnostic.

Not in the reference (aballiet/data-check is a two-table diff tool);
this is a beyond-reference training-data-pipeline operator
(SURVEY.md §2.11).

Scale shape, per entry point:

* ``line_duplicate_stats`` — ONE scan+split+posexplode pass (the
  per-hash doc-count aggregation reads the SAME shuffle as the join
  probe: both subtrees project exactly (_id, _h), so AQE stage reuse
  collapses them — pytest-asserted, the cross_doc_ngram pattern). The
  shuffle carries (id, 16 B hash) only, never line text. Hot
  boilerplate hashes are one counter row on the build side and an
  AQE-skew-splittable join partition on the probe side.
* ``duplicated_line_hashes`` — the corpus's boilerplate vocabulary
  (hash, n_docs with n_docs >= min_docs) as a frame a pipeline
  computes once, persists next to the incremental dedup stores, and
  reuses across strip runs and crawl increments.
* ``strip_duplicate_lines`` — joins the positional lines against that
  (small) vocabulary size-aware via refint.maybe_broadcast: under the
  broadcast cap, line TEXT is never shuffled by hash at all — the
  only text shuffle is the final per-document regroup, which any
  order-preserving reconstruction needs. Beyond the cap it degrades
  to one hash-keyed shuffle join (AQE skew-splittable), never
  anything quadratic. collect_list in the regroup is bounded by one
  document's line count, never corpus size.

``hash_fn``: 'md5' (default) keys lines by the 32-char hex digest so
an external engine (the DuckDB oracle) re-derives every value;
'xxhash64' shuffles an 8-byte long instead — 4x less key weight, the
right choice at 100 TB (a cross-line collision can only overcount a
line's document frequency, at ~n_lines²/2⁶⁴ probability, i.e. it can
only make the filter infinitesimally more aggressive).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from data_check_spark.operators.refint import maybe_broadcast
from data_check_spark.operators.spread import spread_cpu

__all__ = [
    "duplicated_line_hashes",
    "line_duplicate_stats",
    "strip_duplicate_lines",
]

_WS = r"\s+"


def _hash_col(norm: Column, hash_fn: str) -> Column:
    if hash_fn == "md5":
        return F.md5(norm.cast("binary"))
    if hash_fn == "xxhash64":
        return F.xxhash64(norm)
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def _norm_col(line: Column) -> Column:
    """Frequency-counting key: lowercase, collapse internal
    whitespace, trim. Normalization is a counting key, not a rewrite —
    outputs always carry the original bytes."""
    return F.trim(F.regexp_replace(F.lower(line), _WS, " "))


def _pos_lines(df: DataFrame, id_col: str, text_col: str, sep_regex: str, hash_fn: str):
    """(_id, _pos, _line, _h): every segment of every document that
    does not normalize to '', positionally ordered, keyed by the hash
    of its normalized form. Documents with NULL text produce no rows."""
    # conditional CPU spread (operators/spread.py): split + posexplode
    # + normalize + hash is the dominant map cost; a few-row-group
    # source would otherwise serialize it on one core. Both branches of
    # line_duplicate_stats call this with the identical input, so the
    # added exchange stays part of the shared (reused) subtree.
    slim = spread_cpu(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")), "_id"
    )
    raw = F.split(F.col("_t"), sep_regex)
    return (
        slim.select("_id", F.posexplode(raw).alias("_pos", "_line"))
        .withColumn("_norm", _norm_col(F.col("_line")))
        .filter(F.col("_norm") != "")
        .select("_id", "_pos", "_line", _hash_col(F.col("_norm"), hash_fn).alias("_h"))
    )


def line_duplicate_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    sep_regex: str = r"\n",
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document duplicated-line census: (id, n_lines,
    n_dup_lines) where ``n_dup_lines`` counts the document's segments
    (every occurrence, positions included) whose normalized form
    appears in at least ``min_docs`` documents corpus-wide. The
    n_dup_lines/n_lines ratio is the CCNet boilerplate-mass signal a
    curation gate thresholds on. Documents with no qualifying segment
    (NULL text, all-blank) are omitted — they have no lines to count.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # Stats never need _pos/_line, so project them away BEFORE the
    # shuffle: both the per-hash count branch and the join probe then
    # share the identical (scan, split, explode, hash, Exchange(_h))
    # subtree and AQE stage reuse runs the heavy map work once
    # (pytest-asserted in tests/test_linededup.py). The explicit
    # repartition also satisfies the count_distinct's (_h,_id)/(_h)
    # distributions, so the count branch plans no exchange of its own.
    lines = _pos_lines(df, id_col, text_col, sep_regex, hash_fn).select("_id", "_h")
    shuffled = lines.repartition(F.col("_h"))
    per_h = shuffled.groupBy("_h").agg(F.count_distinct("_id").alias("_docs"))
    return (
        shuffled.join(per_h, "_h")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count_if(F.col("_docs") >= F.lit(min_docs)).alias("n_dup_lines"),
        )
    )


def duplicated_line_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    sep_regex: str = r"\n",
    hash_fn: str = "md5",
) -> DataFrame:
    """The corpus's boilerplate vocabulary: (line_hash, n_docs) for
    every normalized segment present in at least ``min_docs``
    documents. Shuffles (id, hash) pairs only — never segment text.
    Compute once, persist (16 B + count per boilerplate line — tiny
    next to the corpus), reuse across strip runs.

    Incremental use (the minhash_incremental pattern,
    operators/dedup.py): persist the UNFILTERED counts with
    ``min_docs=1``; on a crawl increment, union the increment's
    (line_hash, n_docs) rows with the stored ones and re-sum per hash
    — document ids are disjoint across increments, so summed counts
    equal a full recompute (pytest-asserted) and the validated corpus
    is never rescanned. ``min_docs=1`` is allowed HERE only (it is
    the store's retention policy, not a dedup threshold)."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    return (
        _pos_lines(df, id_col, text_col, sep_regex, hash_fn)
        .groupBy("_h")
        .agg(F.count_distinct("_id").alias("n_docs"))
        .filter(F.col("n_docs") >= F.lit(min_docs))
        .withColumnRenamed("_h", "line_hash")
    )


def strip_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    sep_regex: str = r"\n",
    joiner: str = "\n",
    hash_fn: str = "md5",
    dup_hashes: DataFrame | None = None,
    broadcast: bool | str = "auto",
) -> DataFrame:
    """The cleaned corpus: (id, n_lines, n_dropped, text_clean) with
    every segment whose normalized form appears in >= ``min_docs``
    documents removed, the survivors re-joined by ``joiner`` in their
    original order with their ORIGINAL bytes. A document whose every
    segment is boilerplate stays in the output with text_clean = '' —
    whether to drop empties is a quarantine policy, not a dedup fact.
    Documents with NULL text are omitted.

    Blank segments (normalizing to '') are DROPPED from text_clean and
    counted in neither n_lines nor n_dropped — the CCNet convention
    (blank runs are formatting, not content, and would otherwise
    dominate the vocabulary). Consequence: the rewrite collapses
    paragraph breaks ('a\\n\\nb' -> 'a\\nb') even for documents with no
    duplicate line; keep the original text column when downstream
    consumers need the paragraph structure (tests/test_linededup.py
    pins this).

    ``dup_hashes``: a precomputed/persisted ``duplicated_line_hashes``
    frame (column ``line_hash``); derived from ``df`` when None.
    ``broadcast`` follows refint.maybe_broadcast policy ('auto' =
    size-aware): when the vocabulary broadcasts, segment text is never
    shuffled by hash — the per-document regroup is the only text
    shuffle in the plan.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if dup_hashes is None:
        dup_hashes = duplicated_line_hashes(
            df, id_col, text_col, min_docs, sep_regex, hash_fn
        )
    dup = maybe_broadcast(
        dup_hashes.select(F.col("line_hash").alias("_h"), F.lit(True).alias("_dup")),
        broadcast,
    )
    marked = _pos_lines(df, id_col, text_col, sep_regex, hash_fn).join(
        dup, "_h", "left"
    )
    survivor = F.when(
        F.col("_dup").isNull(), F.struct(F.col("_pos"), F.col("_line"))
    )
    return marked.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count_if(F.col("_dup").isNotNull()).alias("n_dropped"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(survivor)), lambda x: x["_line"]),
            joiner,
        ).alias("text_clean"),
    )
