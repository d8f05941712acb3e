"""Similarity search over an embedding column (array<float>).

Two paths, as a training-data pipeline needs:

* **brute_force_topk** — exact cosine top-k for a (small) query set:
  the queries are broadcast, candidates stream through a map-side
  join, the per-query top-k comes from a window rank. Exact baseline;
  cost O(|Q|·N) — fine for |Q| up to thousands at 100 TB because the
  scan is embarrassingly parallel and nothing but (id, score) is
  shuffled.
* **lsh_topk / random-hyperplane LSH** — the scale path: sign-of-dot-
  product against H fixed hyperplanes buckets vectors; only
  same-bucket (or near-bucket via multi-probe bands) pairs are
  scored. Sub-linear candidate generation; recall measured in tests
  against the brute-force baseline.
* **cosine_near_duplicates** — all pairs above a cosine threshold
  within LSH buckets (embedding near-dup dedup).

Dot products use a vectorized pandas UDF (Arrow batches → numpy
float64 matmul) — the fast path for per-row linear algebra that
built-in functions can't express efficiently. A pure-JVM
``zip_with``/``aggregate`` variant is kept for environments where
Python workers are undesirable and for oracle-parity checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def cosine_jvm(a: Column, b: Column) -> Column:
    """JVM-side cosine similarity of two array<float/double> columns
    (zip_with + aggregate; accumulates in double)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.try_divide(dot, na * nb)


# DoubleType() (not the DDL string "double") so the UDF can be defined
# at import time without an active SparkSession.
@pandas_udf(DoubleType())
def _cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine: one numpy matmul per batch, float64."""
    am = np.asarray(a.tolist(), dtype=np.float64)
    bm = np.asarray(b.tolist(), dtype=np.float64)
    dot = np.einsum("ij,ij->i", am, bm)
    na = np.linalg.norm(am, axis=1)
    nb = np.linalg.norm(bm, axis=1)
    denom = na * nb
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(denom > 0, dot / denom, np.nan)
    return pd.Series(out)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_pandas_udf: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query → (query_id, neighbor_id, cosine,
    rank). Queries are broadcast (map-side nested-loop join — zero
    shuffle of the candidate table); ties broken by neighbor id so
    results are deterministic."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    j = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = (
        _cosine_pandas(F.col("_qv"), F.col("_cv"))
        if use_pandas_udf
        else cosine_jvm(F.col("_qv"), F.col("_cv"))
    )
    scored = j.select(
        "query_id", "neighbor_id", F.round(cos, round_to).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of dot products with
    n_planes fixed pseudo-random hyperplanes (deterministic from seed,
    generated driver-side with numpy, embedded as literals)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        coeffs = F.array(*[F.lit(float(x)) for x in planes[p]])
        dot = F.aggregate(
            F.zip_with(vec, coeffs, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. With B≈2^n_planes buckets the scored set shrinks ~B×;
    recall is tested against brute_force_topk. Bucketing is a map-only
    pass; the bucket equi-join shuffles only (id, bucket, vec-in-bucket)."""
    b = hyperplane_bucket(F.col(vec_col), dim, n_planes)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), b.alias("_bucket")
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), b.alias("_bucket")
        )
    )
    j = q.join(c, "_bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = j.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine_pandas(F.col("_qv"), F.col("_cv")), round_to).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_near_duplicates(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine ≥ threshold),
    candidates restricted to same LSH bucket (high-cosine pairs very
    likely share all sign bits; recall tested vs brute force)."""
    b = hyperplane_bucket(F.col(vec_col), dim, n_planes)
    v = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), b.alias("_bucket"))
    a, c = v.alias("a"), v.alias("b")
    pairs = a.join(
        c,
        (F.col("a._bucket") == F.col("b._bucket")) & (F.col("a._id") < F.col("b._id")),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.round(_cosine_pandas(F.col("a._v"), F.col("b._v")), round_to).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold).orderBy("id_a", "id_b")
