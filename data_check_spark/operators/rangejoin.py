"""Distributed point-in-interval (range) join: pair every left
"point" row whose ``ts_col`` falls inside a right "interval" row's
``[start_col, end_col]``.

Spark plans a raw inequality join (``p.ts BETWEEN iv.start AND
iv.end``) as a broadcast-nested-loop or cartesian product — O(|P|·|I|)
at any cluster size. This implementation is the standard bucketed
rendering (the same idea as Databricks' range-join bin optimization,
expressed with public DataFrame ops):

1. choose a ``bucket_width`` (seconds, or plain units for numeric
   columns); each point maps to ONE bucket ``floor(ts / w)``;
2. each interval EXPLODES to the buckets its span overlaps —
   ``sequence(floor(start/w), floor(end/w))`` — typically 1-2 rows
   when the width is chosen near the typical interval length;
3. an ordinary hash equi-join on the bucket id (plus ``key_col``
   when given) followed by the EXACT containment filter.

Cost: one shuffle of points + one shuffle of exploded intervals; each
qualifying pair is produced exactly once (a point lives in exactly
one bucket), so no post-join dedup. Explode factor is
``len(interval)/w + 1`` per interval — pick ``w`` near the median
interval length; pathologically long intervals are the caller's
signal to split the dimension (or raise ``w``). Hot buckets (bursts)
are plain join skew — AQE skew-join splits them.

The reference engine has no range join (its joins are single-key
equality, /root/reference/data_check/processors/bigquery.py); this is
part of the beyond-reference training-pipeline layer (attributing
events to incident/outage/session windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_check_spark.operators.asofjoin import epoch_seconds


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    *,
    bucket_width: float,
    key_col: str | None = None,
    bounds: str = "closed",
) -> DataFrame:
    """Return all (point, interval) pairs with ``point.ts`` inside the
    interval — ``closed`` bounds ``[start, end]`` (default) or
    ``half_open`` ``[start, end)``. Column names must not overlap
    between the two inputs (rename before calling); ``key_col`` (same
    name on both sides, e.g. a user id) turns the join into
    per-key containment. Timestamp and numeric columns both work:
    everything is bucketed via ``cast('double')``.
    """
    if bounds not in ("closed", "half_open"):
        raise ValueError(f"bounds must be 'closed' or 'half_open', got {bounds!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = (set(points.columns) & set(intervals.columns)) - {key_col}
    if overlap:
        raise ValueError(
            f"point/interval column names overlap: {sorted(overlap)} — "
            "rename one side before joining"
        )
    taken = {"_b"} & (set(points.columns) | set(intervals.columns))
    if taken:
        # withColumn('_b', ...) would silently REPLACE a user column
        # of that name (and the final drop removes it entirely)
        raise ValueError(
            "column name '_b' is reserved by interval_join's bucket "
            "stage — rename it before joining"
        )
    w = float(bucket_width)

    p = points.withColumn(
        "_b", F.floor(epoch_seconds(points, ts_col) / F.lit(w)).cast("long")
    )
    iv = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(epoch_seconds(intervals, start_col) / F.lit(w)).cast("long"),
                    F.floor(epoch_seconds(intervals, end_col) / F.lit(w)).cast("long"),
                )
            ),
        )
    )
    on = ["_b", key_col] if key_col else ["_b"]
    upper = (
        F.col(ts_col) <= F.col(end_col)
        if bounds == "closed"
        else F.col(ts_col) < F.col(end_col)
    )
    return (
        p.join(iv, on=on, how="inner")
        .filter((F.col(ts_col) >= F.col(start_col)) & upper)
        .drop("_b")
    )
