"""Distributed as-of join: for every left row (key, ts), attach the
payload of the right row with the same key whose timestamp is the
closest at-or-before (``direction='backward'``, the default) or
at-or-after (``'forward'``) the left timestamp, optionally within a
``tolerance``.

Spark has no built-in as-of join (pandas ``merge_asof`` is the
single-node reference semantics; Flink calls this a temporal join).
A naive distributed rendering — range-join every left row to all
earlier right rows and take max(ts) — explodes quadratically on hot
keys. This implementation is the scale-correct union form:

1. project both sides to (key, ts, side-tag, tiebreak, payload-struct)
   and UNION them — right rows carry their payload, left rows carry
   their full row and a NULL payload;
2. one hash-partition shuffle on key, in-partition sort by
   (ts, side, tiebreak) — right rows sort BEFORE left rows at equal
   ts so "at-or-before" includes ties;
3. a running ``last(payload, ignorenulls=True)`` window
   (UNBOUNDED PRECEDING → CURRENT ROW) carries the latest right
   payload forward; filter back to left rows.

Cost: ONE shuffle of (key, ts, payload, left row) + an in-partition
sort — the same asymptotics as a single equi-join, no pair explosion,
and the window is a running aggregate (O(n) per partition, no
re-scan per frame row). The left row rides the shuffle whole: one
wide shuffle beats the alternative (project (key, ts, rowid), window,
then equi-join the result back to the left table = a SECOND full
shuffle of the same wide rows plus a join) whenever the payload is
narrower than the left row — i.e. always. Project left down to the
columns you need BEFORE calling if the table is very wide. Hot keys land on one task like any
single-key groupBy; AQE skew handling and/or a coarser composite key
(key, time-bucket) are the standard remedies and are the caller's
call, since bucketing changes lookback semantics across bucket edges.

Determinism: when several right rows share (key, ts), the one with
the LARGEST ``tiebreak`` column wins, at any parallelism (the sort
key is total). Forward mode picks the smallest at-or-after ts, same
largest-tiebreak rule on ties.

``tolerance`` (seconds) post-filters the carried match: a match whose
|left.ts − right.ts| exceeds it is nulled out — same contract as
pandas ``merge_asof(tolerance=...)``.

The reference engine has no as-of join (its surface is two-table
equality diffing, /root/reference/data_check/processors/bigquery.py);
this operator is part of the beyond-reference training-pipeline
layer (event attribution / sessionization / point-in-time feature
joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """The column as a double suitable for time arithmetic/bucketing:
    fractional epoch seconds for timestamp columns (TIMESTAMP_NTZ
    cannot cast straight to double — read as session-tz instants,
    which shifts both join sides by the same constant), the plain
    double cast for numeric columns."""
    if dict(df.dtypes)[col].startswith("timestamp"):
        return F.unix_micros(F.col(col).cast("timestamp")) / F.lit(1e6)
    return F.col(col).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: list[str],
    *,
    direction: str = "backward",
    tolerance: float | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Return ``left`` with ``<payload>{suffix}`` columns (and
    ``ts{suffix}``, the matched right timestamp) appended; rows with
    no qualifying right row get NULLs.

    ``payload_cols`` are taken from ``right``. ``tiebreak_col``
    (default: the first payload column) breaks exact-(key, ts) ties
    deterministically — largest value wins.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    tb = tiebreak_col or payload_cols[0]

    left_cols = left.columns
    payload = F.struct(
        F.col(ts_col).alias("_match_ts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    # Right rows: key, ts, tiebreak, payload; left columns NULL. A
    # NULL-ts right row can match nothing (it would sort FIRST under
    # nulls-first asc and be carried to every left row) — drop it.
    right = right.filter(F.col(ts_col).isNotNull())
    r = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tb).alias("_tb"),
        payload.alias("_payload"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}") for c in left_cols],
    )
    # Left rows: full row along for the ride, NULL payload (its type
    # is taken from the right projection via the union).
    l = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(dict(right.dtypes)[tb]).alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    u = r.unionByName(l)

    if direction == "backward":
        # right-before-left at equal ts; among equal right ts the
        # largest tiebreak sorts last → running last() picks it.
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc()]
    else:
        # descending ts: the running last() seen by a left row is the
        # SMALLEST right ts >= left ts; tiebreak ascending again makes
        # the largest tiebreak the last among equals.
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_tb").asc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_m", F.last("_payload", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )

    # a NULL-ts left row has no "as of" instant: keep the row, NULL
    # match (merge_asof rejects NULL keys outright; keeping the row
    # with no match is the DataFrame-friendly equivalent)
    m = F.when(F.col("_ts").isNotNull(), F.col("_m"))
    if tolerance is not None:
        if dict(u.dtypes)["_ts"].startswith("timestamp"):
            gap = F.abs(
                F.unix_micros(F.col("_ts").cast("timestamp"))
                - F.unix_micros(m.getField("_match_ts").cast("timestamp"))
            ) / F.lit(1e6)
        else:
            gap = F.abs(
                F.col("_ts").cast("double") - m.getField("_match_ts").cast("double")
            )
        m = F.when(gap <= F.lit(float(tolerance)), m)

    out = carried.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        m.getField("_match_ts").alias(f"ts{suffix}"),
        *[m.getField(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out
