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
    # NULL vectors filtered on both sides — same hazard ivf_topk
    # documents (one NULL makes the Arrow batch a ragged object array
    # and fails the stage)
    q = F.broadcast(
        queries.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
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
    """JVM-only random-hyperplane sign bits (interpreted HOF per plane
    — O(n_planes·dim) per row with no codegen). Kept for environments
    without Python workers; the hot path is hyperplane_bits_udf, one
    Arrow-batched matmul for all planes at once."""
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


def hyperplane_bits_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Vectorized sign-bit bucketing: ONE numpy matmul per Arrow batch
    against the (dim × n_planes) plane matrix, bits packed into a
    bigint. Replaces n_planes interpreted aggregate() passes per row —
    at 16 planes × 768 dims this is the difference between the
    bucketing being free vs being the bottleneck. Deterministic from
    seed; identical bits to hyperplane_bucket (tested)."""
    rng = np.random.RandomState(seed)
    planes_t = rng.standard_normal((n_planes, dim)).T.copy()  # dim × planes
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def bits(v: pd.Series) -> pd.Series:
        m = np.asarray(v.tolist(), dtype=np.float64)  # batch × dim
        signs = (m @ planes_t) > 0                    # batch × planes
        return pd.Series(signs @ weights)

    return bits


def _banded(df: DataFrame, bits_col: str, n_planes: int, bands: int) -> DataFrame:
    """Explode packed sign bits into (band, band_bits) bucket rows —
    OR-amplified LSH: a pair is a candidate if ANY band's r=n_planes/bands
    bits agree, so recall = 1-(1-p^r)^b instead of the all-bits-AND
    p^n_planes that collapses as n_planes grows."""
    r = n_planes // bands
    mask = (1 << r) - 1
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("_band"),
                        F.shiftrightunsigned(F.col(bits_col), b * r)
                        .bitwiseAND(F.lit(mask))
                        .alias("_bbits"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bb"),
    ).select(*[c for c in df.columns], "_bb._band", "_bb._bbits")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing ANY sign-bit
    band with the query (OR-amplified hyperplane LSH). With r =
    n_planes/bands bits per band, a neighbor at angle θ is a candidate
    with prob 1-(1-(1-θ/π)^r)^bands — e.g. cos≈0.95, 16 planes / 4
    bands → ~0.99, where the old all-bits bucket gave ~0.2. Bucketing
    is ONE pandas-UDF matmul pass; the band join shuffles only
    (id, band, bits, vec). Recall ≥0.9 vs brute_force_topk is asserted
    in tests."""
    bits = hyperplane_bits_udf(dim, n_planes, seed)
    # NULL vectors filtered on both sides (the ivf_topk hazard: one
    # NULL rags the Arrow batch and fails the stage)
    c = _banded(
        embeddings.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            bits(F.col(vec_col)).alias("_bits"),
        ),
        "_bits", n_planes, bands,
    )
    q = F.broadcast(
        _banded(
            queries.filter(F.col(vec_col).isNotNull()).select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("_qv"),
                bits(F.col(vec_col)).alias("_bits"),
            ),
            "_bits", n_planes, bands,
        )
    )
    cand = (
        q.join(c, ["_band", "_bbits"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path the pipeline spec
# names ("an IVF or LSH-bucketed variant"); the IVF-flat scheme of
# Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011) §V without the PQ compression of residuals.
# A coarse quantizer (spherical k-means) partitions vectors into
# cells; a query scores only the vectors in its n_probe nearest cells. vs hyperplane LSH:
# cells adapt to the data distribution (clustered corpora get
# proportionate cells, where fixed random hyperplanes split clusters
# blindly), at the cost of a training step.
#
# Scale shape: training reads a BOUNDED deterministic sample to the
# driver (max_sample rows — the same bounded-readout class as sketch
# collects); assignment is one Arrow-batched matmul per batch with the
# centroid matrix shipped in the UDF closure (a few n_centroids×dim
# floats); the probe join shuffles only vectors in probed cells.
# ---------------------------------------------------------------------------


# Above this many input partitions the default TakeOrdered sampling
# path switches to the hash-filtered one: TakeOrdered merges up to
# max_sample rows PER PARTITION on the driver, so its driver cost is
# nparts-linear, while the hash path's single count() job is a
# map-side aggregate whose driver cost is O(1).
AUTO_HASH_SAMPLE_PARTS = 64


def _auto_sample_mod(sel: DataFrame, max_sample: int) -> int | None:
    """Resolve sample_mod='auto': None (TakeOrdered) below
    AUTO_HASH_SAMPLE_PARTS input partitions, else a modulus derived
    from the actual row count so the hash filter passes ~4·max_sample
    rows (comfortably ≥ max_sample w.h.p., and the residual
    TakeOrdered merges ≤ ~4·max_sample/nparts rows per partition).
    The count() is one extra map-side job — cheap next to the
    10^5-way driver merge it replaces, and only paid in the
    many-partition regime."""
    nparts = sel.rdd.getNumPartitions()
    if nparts <= AUTO_HASH_SAMPLE_PARTS:
        return None
    n = sel.count()
    mod = n // (4 * max_sample)
    return int(mod) if mod >= 2 else None


def kmeans_centroids(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_sample: int = 20_000,
    n_iters: int = 5,
    sample_mod: int | None | str = "auto",
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer. Init = the
    first n_centroids sample vectors; ``n_iters`` Lloyd steps with
    max-dot assignment on L2-normalized vectors; empty cells keep
    their previous centroid. Returns an (n_centroids × dim) float64
    matrix of unit rows.

    Sampling (``sample_mod``):

    * ``'auto'`` (default) — scale-safe: below
      AUTO_HASH_SAMPLE_PARTS input partitions use the TakeOrdered
      path (no extra job); above it derive a modulus from the row
      count (_auto_sample_mod) so the driver never merges
      per-partition TakeOrdered results at high partition counts
      (VERDICT r4 #1).
    * ``None`` — force TakeOrdered: the ``max_sample`` lowest-id
      vectors. Deterministic at any parallelism but ships up to
      max_sample rows PER PARTITION to the driver merge — fine to
      ~10^4 partitions, wrong at 10^5+.
    * int — force the hash path with that modulus: rows with
      xxhash64(id) % mod == 0 are collected — one filtered scan,
      ~N/mod driver rows, partition-invariant, and
      id-distribution-independent (hash, not id range)."""
    sel = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    if sample_mod == "auto":
        sample_mod = _auto_sample_mod(sel, max_sample)
    if sample_mod is not None:
        rows = (
            sel.filter(F.pmod(F.xxhash64("_id"), F.lit(sample_mod)) == 0)
            .orderBy("_id")
            .limit(max_sample)
            .collect()
        )
    else:
        rows = sel.orderBy("_id").limit(max_sample).collect()
    x = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    if len(x) < n_centroids:
        raise ValueError(f"need >= {n_centroids} sample vectors, got {len(x)}")
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    c = x[:n_centroids].copy()
    for _ in range(n_iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                c[j] = members.sum(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def centroids_to_df(spark, centroids: np.ndarray) -> DataFrame:
    """Persistable form of a trained coarse quantizer: one row per
    cell (cell int, centroid array<double>). Write it as parquet next
    to the audit tables and the IVF index is FROZEN — later query
    batches (or another engine) reuse the identical cells without
    retraining, the same lifecycle as the LM count store and the
    bloom filter's persisted form."""
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
        "cell int, centroid array<double>",
    )


def centroids_from_df(df: DataFrame) -> np.ndarray:
    rows = df.orderBy("cell").collect()
    if [r["cell"] for r in rows] != list(range(len(rows))):
        raise ValueError("centroid frame must carry cells 0..n-1 exactly once")
    return np.asarray([r["centroid"] for r in rows], dtype=np.float64)


def _cell_udfs(centroids: np.ndarray, n_probe: int):
    """(assign_udf, probe_udf): nearest cell per vector / n_probe
    nearest cells per query — one matmul per Arrow batch each."""
    from pyspark.sql.types import ArrayType, IntegerType

    ct = centroids.T.copy()  # dim × n_centroids

    @pandas_udf(IntegerType())
    def assign_cell(v: pd.Series) -> pd.Series:
        m = np.asarray(v.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(m @ ct, axis=1).astype(np.int32))

    @pandas_udf(ArrayType(IntegerType()))
    def probe_cells(v: pd.Series) -> pd.Series:
        m = np.asarray(v.tolist(), dtype=np.float64)
        scores = m @ ct
        # argsort desc, deterministic tie-break by cell id (stable sort
        # on negated scores)
        order = np.argsort(-scores, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    return assign_cell, probe_cells


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    max_sample: int = 20_000,
    sample_mod: int | None | str = "auto",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k → (query_id, neighbor_id, cosine, rank).
    Candidates = vectors whose cell is among the query's n_probe
    nearest centroids; exact cosine re-scores candidates. Expected
    scan fraction ≈ n_probe/n_centroids of the corpus per query. A
    vector's own cell is always its nearest centroid's, so an exact
    copy of a query is always a candidate (recall 1.0 on planted
    copies — the driver contract). NULL vectors are filtered on both
    sides — they cannot be assigned a cell (a single NULL makes the
    Arrow batch a ragged object array and fails the stage).

    Pass ``centroids`` (from a stored frame via centroids_from_df) to
    reuse a FROZEN quantizer instead of retraining — train once per
    corpus version, serve every later query batch from the stored
    index; ``n_centroids`` is then taken from the matrix."""
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(
            embeddings, dim, n_centroids, id_col, vec_col, max_sample,
            sample_mod=sample_mod,
        )
    )
    assign_cell, probe_cells = _cell_udfs(cents, n_probe)
    c = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        assign_cell(F.col(vec_col)).alias("_cell"),
    )
    q = F.broadcast(
        queries.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.explode(probe_cells(F.col(vec_col))).alias("_cell"),
        )
    )
    cand = q.join(c, "_cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
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
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    seed: int = 42,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine ≥ threshold),
    candidates = pairs sharing ANY sign-bit band (OR-amplification —
    see lsh_topk; the old same-full-bucket rule had recall ≈
    (1-θ/π)^n_planes, ~0.5 at cos 0.95 / 10 planes). Survivors are
    verified with the exact cosine. Band buckets above ``max_bucket``
    are dropped before the self-join (LSH hygiene, same as the
    MinHash path)."""
    bits = hyperplane_bits_udf(dim, n_planes, seed)
    v = _banded(
        embeddings.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            bits(F.col(vec_col)).alias("_bits"),
        ),
        "_bits", n_planes, bands,
    )
    sizes = v.groupBy("_band", "_bbits").agg(F.count(F.lit(1)).alias("_m"))
    v = v.join(
        F.broadcast(sizes.filter(F.col("_m") > max_bucket).select("_band", "_bbits")),
        ["_band", "_bbits"],
        "left_anti",
    )
    a, c = v.alias("a"), v.alias("b")
    pairs = (
        a.join(
            c,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bbits") == F.col("b._bbits"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                F.col("a._v").alias("_va"), F.col("b._v").alias("_vb"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            F.round(_cosine_pandas(F.col("_va"), F.col("_vb")), round_to).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold).orderBy("id_a", "id_b")


def embedding_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    norm_tol: float = 1e-3,
) -> DataFrame:
    """One-row quality gate for an embedding column — the checks an
    ANN/near-dup pipeline needs green before it trusts the vectors:
    NULL vectors, wrong dimensionality, NaN components, and norms off
    unit by more than ``norm_tol`` (cosine ops here assume unit-ish
    vectors; a silently unnormalized shard skews every score).

    ONE fused aggregation scan, all JVM higher-order functions — no
    Python workers, nothing shuffled but the final counters. The norm
    check squares components in DOUBLE via a sequential fold; the
    tolerance (default 1e-3) sits ~9 orders above any cross-engine
    accumulation difference, so the count is engine-exact in practice
    (same reasoning as the drift thresholds). ``dim=None`` skips the
    dimension check."""
    v = F.col(vec_col)
    nonnull = v.isNotNull()
    has_nan = F.exists(v, lambda x: F.isnan(x))
    norm2 = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    good_shape = nonnull & ~has_nan
    if dim is not None:
        good_shape = good_shape & (F.size(v) == dim)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(~nonnull).alias("n_null"),
        F.count_if(nonnull & has_nan).alias("n_nan"),
        F.count_if(
            good_shape & (F.abs(norm2 - 1.0) > norm_tol)
        ).alias("n_norm_off"),
    ]
    if dim is not None:
        aggs.insert(
            2, F.count_if(nonnull & (F.size(v) != dim)).alias("n_wrong_dim")
        )
    return df.agg(*aggs)
