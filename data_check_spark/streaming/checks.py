"""Structured-Streaming variants of the validation checks.

The reference is strictly batch/click-driven
(``/root/reference/data_check/streamlit_app.py:189-351``) and the
north rule's resumability is manifest-based batch — but a continuously
ingested web-pages table wants the same checks as data arrives.
This module gives the streaming shape:

* ``stream_pages`` — file-source readStream over the pages schema
  (new parquet files under a directory = new WARC dumps landing).
* ``streaming_stat_verdicts`` — event-time-windowed fused stats pass
  (same single-aggregation idea as operators/stats.py) with a
  watermark for late data; emits one verdict row per (window, check).
* ``streaming_dedup`` — stateful first-seen URL dedup via
  ``applyInPandasWithState`` (custom stateful operator: keyed state =
  "seen" flag per url-hash group, Arrow-batched).

All are testable with ``trigger(availableNow=True)`` against a
directory of parquet files — the same code attaches to Kafka/Kinesis
sources on a real cluster by swapping the reader.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", StringType()),  # binary in batch; string-safe here
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_pages(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    return (
        spark.readStream.schema(schema or PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def streaming_stat_verdicts(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_null_rate: float = 0.05,
) -> DataFrame:
    """Per-event-time-window verdicts: one fused aggregation computes
    row counts + null counts for text/lang; thresholds turn them into
    pass/fail rows. Watermark bounds state so this runs forever."""
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("text").isNull()).alias("null_text"),
            F.count_if(F.col("lang").isNull()).alias("null_lang"),
        )
    )
    null_rate_text = F.try_divide(F.col("null_text").cast("double"), F.col("n_rows").cast("double"))
    null_rate_lang = F.try_divide(F.col("null_lang").cast("double"), F.col("n_rows").cast("double"))
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("n_rows"),
        F.round(null_rate_text, 6).alias("null_rate_text"),
        F.round(null_rate_lang, 6).alias("null_rate_lang"),
        ((null_rate_text <= max_null_rate) & (null_rate_lang <= max_null_rate)).alias("passed"),
    )


def streaming_expr_verdicts(
    pages: DataFrame,
    predicates: dict[str, str],
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_violation_ratio: float | dict[str, float] = 0.0,
) -> DataFrame:
    """Streaming twin of the batch ``ExprCheck`` (plans/suite.py): the
    same declarative row predicates — e.g. the html→text extraction
    invariant (functions/html), ``url LIKE 'http%'`` — gated per
    event-time window instead of per partition, with IDENTICAL
    fail-closed semantics (a row violates when its predicate is FALSE
    **or NULL**) and the identical metric (violation count / window
    row count, unrounded double division), so batch and streaming
    verdict rows are value-interchangeable on the same data (tested).

    ``max_violation_ratio``: one threshold for all checks, or a
    per-name dict (missing names default 0.0).

    Output (long form, one row per window × check):
    (window_start, window_end, check_name, n_rows, violation_ratio,
    threshold, passed).

    Scale: ONE fused windowed aggregation — one ``count_if`` per
    predicate riding a single shared groupBy(window), the streaming
    analogue of the batch fused stats pass (zero extra scans per
    added check); the melt to long form explodes the SMALL aggregate
    rows (|windows| × |checks|), never the input. Watermark bounds
    state so this runs forever."""
    if not predicates:
        raise ValueError("predicates must be a non-empty {name: sql} dict")
    names = list(predicates)
    # fail-closed violation — EXACTLY the batch ExprCheck expression
    # (plans/suite.py expr_viol): NOT coalesce(pred, FALSE)
    viol = {
        n: ~F.coalesce(F.expr(p), F.lit(False)) for n, p in predicates.items()
    }

    def thr(n: str) -> float:
        if isinstance(max_violation_ratio, dict):
            return float(max_violation_ratio.get(n, 0.0))
        return float(max_violation_ratio)

    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("_xn"),
            # counters aliased by POSITION, not name: F.col() re-parses
            # its argument, so a check name containing a dot/backtick
            # would resolve as struct-field access and fail at plan time
            *[F.count_if(viol[n]).alias(f"_x_{i}") for i, n in enumerate(names)],
        )
    )
    melted = agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("_xn").alias("n_rows"),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(n) for n in names]),
                F.array(
                    *[
                        F.struct(
                            F.try_divide(
                                F.col(f"_x_{i}").cast("double"),
                                F.col("_xn").cast("double"),
                            ).alias("ratio"),
                            F.lit(thr(n)).alias("threshold"),
                        )
                        for i, n in enumerate(names)
                    ]
                ),
            )
        ).alias("check_name", "_v"),
    )
    ratio = F.col("_v.ratio")
    threshold = F.col("_v.threshold")
    return melted.select(
        "window_start",
        "window_end",
        "check_name",
        "n_rows",
        ratio.alias("violation_ratio"),
        threshold.alias("threshold"),
        # fail closed like batch: an unevaluable ratio fails
        (ratio.isNotNull() & (ratio <= threshold)).alias("passed"),
    )


def reference_freqs_from(ref_df: DataFrame, col: str = "lang") -> dict:
    """Derive the static reference distribution streaming_psi_verdicts
    consumes from a batch reference snapshot — the SAME frequencies
    the batch CategoricalDriftCheck computes (operators/drift.
    categorical_frequencies), so a suite can hand its batch reference
    to the streaming check and the two emit interchangeable verdicts.
    NULL is kept as its own bucket (key ``None``), matching the batch
    'drift in null-rate is drift' semantics. One tiny collect of the
    |categories|-row frequency table — the reference is a snapshot,
    computed once per deploy, not per micro-batch."""
    from data_check_spark.operators.drift import categorical_frequencies

    return {
        r["category"]: r["freq"]
        for r in categorical_frequencies(ref_df, col).collect()
    }


def reference_freqs_from_profile(profile: DataFrame, kind: str) -> dict:
    """Derive the same static distribution from STORED drift-profile
    rows ((kind, key, freq) — a ``SuiteResult.drift_profile`` or
    ``drift_profile_from_audit`` read-back) instead of rescanning the
    reference snapshot: batch, streaming and stored baselines become
    fully interchangeable. The profile's categorical NULL bucket is a
    SQL NULL key (cast preserves NULL), so it collects back as the
    Python ``None`` key streaming_psi_verdicts expects — identical to
    reference_freqs_from."""
    return {
        r["key"]: r["freq"]
        for r in profile.filter(F.col("kind") == kind)
        .select("key", "freq")
        .collect()
    }


def streaming_psi_verdicts(
    pages: DataFrame,
    reference_freqs: dict,
    col: str = "lang",
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_psi: float = 0.2,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-event-time-window PSI drift against a STATIC reference
    distribution (e.g. last month's lang frequencies) — streaming
    drift without chained stateful operators: because the reference
    categories are known at plan time, per-window per-category counts
    are |categories| count_ifs inside the ONE watermarked windowed
    aggregation (same bounded-state shape as streaming_stat_verdicts),
    and the PSI is a closed-form JVM expression over those counts.

    BATCH INTERCHANGEABILITY: with ``reference_freqs =
    reference_freqs_from(ref_df, col)`` and every streamed category ∈
    reference categories, each window's (psi, threshold, passed)
    equals the batch CategoricalDriftCheck verdict over that window's
    rows vs the same reference (identical p/q arithmetic, identical
    eps floor and 6-dp rounding; pytest-asserted in
    tests/test_streaming.py). A ``None`` key carries the reference's
    NULL bucket (drift in null-rate is drift). The one divergence
    envelope: categories ABSENT from the reference fold into a single
    OTHER bucket with reference mass ``eps``, where the batch gives
    each novel category its own (p, eps) term — streaming OTHER is a
    lower bound on the batch novel-category contribution (log is
    concave; mass concentrated in one bucket drifts less than spread
    over several), and both fail closed as the novel mass grows.

    Emits (window_start, window_end, n_rows, psi, threshold, passed)
    in append mode once the watermark closes each window."""
    cats = sorted(k for k in reference_freqs if k is not None)
    null_q = reference_freqs.get(None)
    c = F.col(col)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, _k in enumerate(cats):
        aggs.append(F.count_if(c == F.lit(_k)).alias(f"_c{i}"))
    if null_q is not None:
        aggs.append(F.count_if(c.isNull()).alias("_null"))
        other_pred = c.isNotNull() & ~c.isin(list(cats))
    else:
        other_pred = c.isNull() | ~c.isin(list(cats))
    aggs.append(F.count_if(other_pred).alias("_other"))
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(*aggs)
    )
    n = F.col("_n").cast("double")

    def term(count_col: str, q_val: float):
        p = F.greatest(F.col(count_col).cast("double") / n, F.lit(eps))
        q = F.lit(max(float(q_val), eps))
        return (p - q) * F.log(p / q)

    psi = F.lit(0.0)
    for i, k in enumerate(cats):
        psi = psi + term(f"_c{i}", reference_freqs[k])
    if null_q is not None:
        psi = psi + term("_null", null_q)
    psi = psi + term("_other", eps)
    psi = F.round(psi, 6)
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("_n").alias("n_rows"),
        psi.alias("psi"),
        F.lit(float(max_psi)).alias("threshold"),
        (psi <= max_psi).alias("passed"),
    )


_DEDUP_OUT = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("first_seen", BooleanType()),
        # observability: the bucket's state size (distinct-hash count)
        # after this batch chunk — lets an operator monitor state
        # growth and alert before memory pressure, and verifies
        # eviction is working when max_state_per_bucket/ttl is set
        StructField("state_size", LongType()),
    ]
)
def streaming_refint_bloom(
    pages: DataFrame,
    bloom,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_violation_rows: int = 0,
    emit: str = "verdicts",
) -> DataFrame:
    """Referential gate on a STREAM via the Bloom bitmap of a
    dimension snapshot (operators/bloom.KeyBloom — build once in
    batch, probe forever). An anti-join per micro-batch would
    re-shuffle the dimension keys every trigger; the bloom probe is a
    STATELESS per-row projection (one Arrow-batched pandas UDF over
    the 16-byte hash pair), so it composes with any downstream
    streaming aggregation and costs no state.

    Verdict semantics are the batch bloom gate's (operators/bloom.py):
    a flagged row's key is CERTAINLY absent from the snapshot
    (precision 1.0), a clean window may hide an expected fpp fraction
    of violating keys — the fail-fast direction. The flagged set is
    fixed-seed deterministic, so a batch re-run over the same rows
    flags the identical keys (pytest-asserted streaming/batch twin in
    tests/test_streaming_bloom.py).

    ``emit='verdicts'``: one row per closed event-time window —
    (window_start, window_end, n_rows, n_violations, threshold,
    passed) in append mode once the watermark passes (bounded state:
    one aggregate row per open window, same shape as
    streaming_stat_verdicts).
    ``emit='violations'``: the certified-violation ROWS as a map-only
    append stream (no watermark, no state) — route to quarantine
    storage while the verdict stream gates the pipeline."""
    from data_check_spark.operators.bloom import bloom_member_probe

    member = bloom_member_probe(pages.sparkSession, bloom)
    viol = ~member(F.col(key_col))
    if emit == "violations":
        return pages.filter(viol)
    if emit != "verdicts":
        raise ValueError(f"emit must be 'verdicts' or 'violations', got {emit!r}")
    nv = F.col("n_violations")
    return (
        pages.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(viol).alias("n_violations"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_rows",
            "n_violations",
            F.lit(float(max_violation_rows)).alias("threshold"),
            (nv <= F.lit(max_violation_rows)).alias("passed"),
        )
    )


def streaming_sessions(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-key gap sessions over a stream via Spark's native
    ``session_window`` — merging-window state the engine manages and
    the watermark bounds, so this runs forever without custom state
    code. Emits one row per closed session: key, session_start,
    session_end, n_events.

    Boundary semantics vs the batch labeler
    (operators/sessionize.sessionize): ``session_window`` spans
    ``[first_ts, last_ts + gap)`` and merges an event landing EXACTLY
    ``gap`` after the previous into the same session only if it is
    strictly inside the half-open end — i.e. an exactly-``gap``
    follower starts a NEW session here, while the batch labeler's
    strictly-greater rule keeps it. Equal up to that single boundary
    instant (tested on gap-free-boundary data in
    tests/test_streaming.py); pick one form per pipeline and stay
    with it.

    Works identically on a batch frame (groupBy(session_window(...)))
    — the batch/streaming interchange pattern this module uses for
    stats and PSI."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("n_events"),
        )
    )


# Bounded state: 8 bytes per distinct url ever seen in the bucket —
# xxhash64 values (computed JVM-side before the Python worker), NOT
# url strings. An earlier design stored a '\n'-joined SORTED string of
# every url (O(corpus) bytes per bucket, re-parsed and re-SORTED every
# micro-batch — an O(n log n) pass over the whole history per batch);
# this is fixed-width, append-only, never sorted.
_DEDUP_STATE = StructType([StructField("seen_hashes", ArrayType(LongType()))])


def _dedup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    max_state: int | None = None,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Keyed stateful dedup. State is an append-only array of int64
    url-hashes: per micro-batch cost is one set() build over the
    bucket's history plus an APPEND of the batch's new hashes — no
    string parsing, no sort of the full history. Membership is a
    vectorized ``Series.isin``; the only growth is 8 bytes per new
    distinct url. (64-bit hash collisions mark a genuinely-new url as
    seen with probability ~n²/2⁶⁴ per bucket — negligible at any
    per-bucket n that fits in memory, and the usual trade for hashed
    dedup state.)

    Eviction (both optional, both bound multi-year state growth):

    * ``max_state`` — FIFO cap: when the bucket's array exceeds it,
      the OLDEST hashes are dropped (they're in first-seen order, so
      this is a truncation, not a sort). A url whose hash was evicted
      and that reappears is reported first_seen again — the standard
      bounded-dedup-state trade, preferable to unbounded memory.
    * ``ttl_ms`` — processing-time timeout: a bucket with no traffic
      for the TTL has its ENTIRE state dropped (Spark invokes this
      function with hasTimedOut=true and no data)."""
    if ttl_ms is not None and state.hasTimedOut:
        state.remove()
        return
    hashes: list[int] = []
    if state.exists:
        (arr,) = state.get
        if arr is not None:
            hashes = list(arr)
    seen: set[int] = set(hashes)
    for pdf in pdfs:
        pdf = pdf.sort_values("warc_ts", kind="mergesort")
        first = ~pdf["_uh"].isin(seen) & ~pdf["_uh"].duplicated()
        new = pdf.loc[first.values, "_uh"].tolist()
        seen.update(new)
        hashes.extend(new)
        if max_state is not None and len(hashes) > max_state:
            evicted = hashes[: len(hashes) - max_state]
            hashes = hashes[len(hashes) - max_state:]
            seen.difference_update(evicted)
        out = pdf.loc[:, ["url", "warc_ts", "text", "lang"]].copy()
        out["first_seen"] = first.values
        out["state_size"] = len(hashes)
        yield out
    state.update((hashes,))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)


def streaming_dedup(
    pages: DataFrame,
    buckets: int = 8192,
    max_state_per_bucket: int | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """First-seen URL filter as a custom stateful streaming operator
    (applyInPandasWithState). Keys are url-hash buckets, so state is
    spread evenly across tasks even with hot domains; output marks
    every row first_seen true/false (filter downstream).

    The url hash is computed ONCE, JVM-side (``xxhash64``), and reused
    for both the bucket key and the dedup membership value — the
    Python worker never hashes strings. ``buckets`` defaults high
    (8192) so each bucket's state array (8 B/url) and per-batch set
    rebuild stay small even at web scale; state size per bucket is
    ~distinct_urls × 8 / buckets bytes.

    CHECKPOINT COMPATIBILITY: the state schema changed from a string
    blob to array<long> (and the default bucket count 64→8192) — an
    applyInPandasWithState checkpoint written by the old format cannot
    be restarted on this version (state deserialization fails; with an
    explicit old bucket count, state would be mis-assigned across
    re-hashed buckets). Start a FRESH checkpointLocation after
    upgrading — Spark cannot migrate arbitrary state schemas in place
    (see SCALE.md §streaming).

    ``max_state_per_bucket`` / ``ttl_ms``: optional eviction so a
    multi-year run's state stays bounded — FIFO hash-cap per bucket
    and processing-time TTL for idle buckets respectively (see
    ``_dedup_fn``); every output row carries ``state_size`` so state
    growth is observable from the stream itself. Defaults (None) keep
    exact-forever semantics."""
    keyed = (
        pages.withColumn("_uh", F.xxhash64("url"))
        .withColumn("bucket", F.pmod(F.col("_uh"), F.lit(buckets)))
        .groupBy("bucket")
    )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        return _dedup_fn(
            key, pdfs, state, max_state=max_state_per_bucket, ttl_ms=ttl_ms
        )

    return keyed.applyInPandasWithState(
        fn,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> Any:
    """availableNow trigger into an in-memory sink; returns the query
    (caller awaits termination and reads spark.table(name)).

    Windowed aggregations need output_mode='complete' under
    availableNow: in append mode a window only emits once the
    watermark passes it, and the watermark stops advancing when the
    bounded input ends — the final windows would never appear."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
