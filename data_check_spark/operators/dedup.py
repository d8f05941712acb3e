"""Deduplication operators for web-scale text corpora (not in the
reference — first-class additions for a training-data pipeline).

All hot-path math is JVM-side (xxhash64, higher-order array
functions) — no Python in the per-row loop.

* **exact_duplicates** — hash-groupBy on md5(text). At 100 TB the
  shuffle carries (16-byte hash, count) partials only, never text.
* **minhash_lsh_pairs** — word-shingle MinHash signatures →
  LSH banding → candidate pairs from same-bucket self-join →
  exact-Jaccard verification. The self-join happens per (band,
  bucket), so only colliding documents ever meet; signature
  computation is a map-only pass.
* **simhash64** — 64-bit SimHash from per-word xxhash64 bit votes;
  near-dups = equal (or low-Hamming) simhash. One explode + one
  groupBy(doc) pass.
* **ngram_jaccard** — exact Jaccard over distinct word n-grams for
  a candidate pair set (verification primitive).
* **embedding near-dup** — see operators/similarity.py (cosine path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n, doc_ids).
    Only the 32-hex-char md5 is shuffled — never the text bytes."""
    h = F.md5(F.col(text_col).cast("binary")).alias("text_hash")
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(h, F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n") > 1)
        .orderBy("text_hash")
    )


def _words(text_col: Column) -> Column:
    return F.filter(
        F.split(F.lower(text_col), r"\s+"), lambda w: F.length(w) > 0
    )


def word_shingles(text_col: Column, k: int = 3) -> Column:
    """Distinct word k-shingles as an array<string> (JVM higher-order
    fns; no explode — the array stays inside the row)."""
    w = _words(text_col)
    n = F.size(w)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    shingle = lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)])  # noqa: E731
    return F.array_distinct(F.transform(idx, shingle))


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per hash-function i, min over shingles of
    xxhash64(i, shingle). Empty shingle sets get NULL mins."""
    return F.array(
        *[F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(F.lit(i), s)))
          for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via MinHash + LSH.

    Plan shape: one map pass computes signatures; explode to (band,
    band_hash, id); groupBy bucket; pairs emitted only inside buckets
    (the LSH point: candidate generation without an all-pairs join);
    exact Jaccard over distinct shingles verifies candidates.
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_k).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    sig = sig.withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))
    banded = sig.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.element_at("_sig", b * rows + r + 1) for r in range(rows)]).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_sh", "bb.band", "bb.bucket")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", F.round(F.try_divide(inter, union), 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
) -> DataFrame:
    """Exact Jaccard over distinct word k-shingles for given
    (id_a, id_b) pairs — the verification primitive."""
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col), shingle_k).alias("_sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select(
        "id_a", "id_b", F.round(F.try_divide(inter, union), 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """63-bit SimHash per document (bit 63 left unused to keep the
    value positive in a signed bigint): explode words, one
    groupBy(doc) with 63 conditional-count aggregates (bit votes),
    reassemble. Near-dups share simhash or low Hamming distance."""
    w = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc"), F.explode(_words(F.col(text_col))).alias("w"))
        .withColumn("h", F.xxhash64("w"))
    )
    votes = [
        F.count_if(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1).alias(f"b{b}")
        for b in range(63)
    ]
    agg = w.groupBy("doc").agg(F.count(F.lit(1)).alias("n"), *votes)
    sim = None
    for b in range(63):
        bit = F.when(F.col(f"b{b}") * 2 > F.col("n"), F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = bit * F.lit(1 << b).cast("bigint")
        sim = term if sim is None else sim + term
    return agg.select(F.col("doc").alias(id_col), sim.alias("simhash")).orderBy(id_col)


def simhash_near_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Documents sharing an identical simhash → (simhash, n, doc_ids)."""
    s = simhash64(df, text_col, id_col)
    return (
        s.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n") > 1)
        .orderBy("simhash")
    )
