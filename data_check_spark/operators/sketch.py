"""Mergeable quantile sketches via Arrow-batched pandas UDFs.

Spark's built-in ``percentile_approx`` (KLL-ish) and
``approx_count_distinct`` (HLL) cover most needs — use them first.
This module exists for the case the built-ins can't serve: a
*persistable, mergeable* per-partition sketch state that an audit
table can store and a later run can combine without rescanning data
(the north rule's "t-digest/KLL sketch accumulation via pandas UDFs").

The sketch here is a fixed-grid centroid histogram (a simplified
t-digest with uniform centroids): per input partition,
``applyInPandas`` emits (bucket_center, weight) rows computed with
numpy; merging sketches = summing weights per center (a groupBy —
associative, order-independent, hence deterministic at any
parallelism). Quantile estimates interpolate the merged CDF.

Accuracy: bounded by grid resolution ((hi-lo)/n_bins); choose
n_bins=512 for ~0.2% rank error on unimodal data. For production
fidelity swap the body for a real t-digest — the Spark plumbing
(Arrow batches in, narrow sketch rows out, groupBy merge) is the part
that matters at 100 TB and is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SKETCH_SCHEMA = "center double, weight bigint"


def partition_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 512,
) -> DataFrame:
    """Per-partition sketch rows (center, weight) via mapInPandas —
    one Arrow-batched numpy pass, output ≤ n_bins rows per task."""
    width = (hi - lo) / n_bins
    slim = df.select(F.col(col).cast("double").alias("_v")).filter(F.col("_v").isNotNull())

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = np.zeros(n_bins, dtype=np.int64)
        for pdf in batches:
            v = pdf["_v"].to_numpy(dtype=np.float64)
            # NaN passes isNotNull and its cast to int64 is undefined —
            # drop before bucketing (would land in an arbitrary bucket)
            v = v[~np.isnan(v)]
            idx = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
            counts += np.bincount(idx, minlength=n_bins)
        nz = np.nonzero(counts)[0]
        yield pd.DataFrame(
            {"center": lo + (nz + 0.5) * width, "weight": counts[nz]}
        )

    return slim.mapInPandas(sketch, schema=SKETCH_SCHEMA)


def merge_sketch(sketches: DataFrame) -> DataFrame:
    """Merge sketch rows (possibly from many runs/partitions/tables):
    weights sum per center — associative and commutative."""
    return sketches.groupBy("center").agg(F.sum("weight").alias("weight"))


def sketch_quantiles(
    sketch: DataFrame, qs: list[float], round_to: int = 6
) -> DataFrame:
    """Quantile estimates from a (merged) sketch → rows (q, value).
    The sketch is tiny (≤ n_bins rows) — collected to the driver and
    interpolated with numpy, like any sketch readout."""
    pdf = sketch.orderBy("center").toPandas()
    centers = pdf["center"].to_numpy(dtype=np.float64)
    weights = pdf["weight"].to_numpy(dtype=np.float64)
    cum = np.cumsum(weights)
    total = cum[-1] if len(cum) else 0.0
    rows = []
    for q in qs:
        if total == 0:
            rows.append((float(q), None))
            continue
        target = q * total
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, len(centers) - 1)
        rows.append((float(q), round(float(centers[i]), round_to)))
    spark = sketch.sparkSession
    return spark.createDataFrame(rows, "q double, value double")


def quantiles_via_sketch(
    df: DataFrame, col: str, lo: float, hi: float, qs: list[float], n_bins: int = 512
) -> DataFrame:
    """End-to-end: per-partition sketch → merge → quantile readout."""
    return sketch_quantiles(merge_sketch(partition_sketch(df, col, lo, hi, n_bins)), qs)
