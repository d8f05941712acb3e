"""Bloom-filter referential gate — zero-shuffle fail-fast refint.

Reference parity note: the reference's referential construct is the
LEFT JOIN + IS NULL exclusive-PK query
(``/root/reference/data_check/processors/bigquery.py:104-141``);
``operators/refint.py`` covers it exactly. This module is the scale
extension for the regime where neither side of that join is cheap:
a 10^12-row fact table keyed by url against a dimension snapshot too
large to broadcast raw (100M+ urls). A Bloom bitmap of the dimension
keys is orders of magnitude smaller than the keys themselves
(~1.8 MB per million keys at fpp 1e-3 vs ~80 MB of raw urls), so it
broadcasts where the key set cannot, and the fact side is then
classified MAP-ONLY — no shuffle, no join.

Direction of certainty (why a Bloom filter fits *violation* hunting):
a Bloom filter has no false negatives for membership, so a
bloom-NEGATIVE fact key is *certainly* absent from the dimension —
a certified violation. False positives only mis-classify true
violations as "maybe member", i.e. the flagged set is a SUBSET of
the exact violation set (never a false alarm) and misses an expected
``fpp`` fraction of violating keys. That gives two modes:

* ``exact=False`` (the fail-fast gate): emit only the certified
  violations. One map-only pass over the fact table; recall
  ≥ 1 - fpp in expectation, precision exactly 1.0, deterministic
  (xxhash64 is fixed-seed, so reruns and different parallelism
  levels flag the identical set).
* ``exact=True``: additionally anti-join the bloom-POSITIVE residue
  against the dimension, catching the fpp stragglers — byte-equal to
  ``referential_violations``. The bloom pre-filter means only
  positive rows (members + fpp of violations) enter the join; when
  violations are common (the fail-fast scenario) or the dimension is
  above the broadcast ceiling (shuffle join), that shrinks the
  shuffled probe side by the violation fraction.

Scale design:
* bitmap built DISTRIBUTED: one scan of the dimension explodes each
  key to its k bit positions, a groupBy(word-index) with map-side
  partial ``bit_or`` reduces to at most m/64 (word, bits) rows, the
  driver collects only those words (m/64 longs — 1/64th of the bit
  count in rows, a few MB for million-key snapshots). Nothing
  key-shaped ever reaches the driver.
* the bitmap ships to executors once per job via
  ``SparkContext.broadcast`` (not closure capture, which would
  re-pickle it per task batch).
* the probe is ONE Arrow-batched pandas UDF over a JVM-computed
  array of k positions per row: numpy gathers the k words and tests
  the k bits for a whole batch at once — no per-row Python.
* NULL fact keys are certified violations on every path (xxhash64
  treats NULL as "skip input", which would alias NULL to the hash of
  the seed alone, so positions are gated on ``isNotNull`` and the
  probe maps a NULL position array to False).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from .refint import maybe_broadcast

# refuse to build a bitmap the driver/executors couldn't comfortably
# hold or broadcast; callers with genuinely larger dimensions should
# raise fpp or fall back to the shuffle anti-join
MAX_BITMAP_BYTES = 256 << 20


def bloom_parameters(n_keys: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: bits m = -n·ln(p)/ln(2)², hashes
    k = (m/n)·ln(2), both rounded up/nearest and floored at 1. m is
    rounded up to a multiple of 64 (whole words)."""
    if n_keys <= 0:
        return 64, 1
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _positions(key: Column, m_bits: int, k_hashes: int) -> Column:
    """array<long> of the key's k bit positions; NULL when the key is
    NULL (xxhash64 skips NULL inputs, which would otherwise alias
    NULL to xxhash64(i) — a value a real key can hash to)."""
    pos = F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
            for i in range(k_hashes)
        ]
    )
    return F.when(key.isNotNull(), pos)


def build_key_bloom(
    dim: DataFrame,
    dim_key: str,
    fpp: float = 1e-3,
    n_keys: int | None = None,
    max_bitmap_bytes: int = MAX_BITMAP_BYTES,
) -> tuple[np.ndarray, int, int]:
    """(bitmap words int64[m/64], m_bits, k_hashes) for the dimension's
    key set. ``n_keys`` sizes the filter; when omitted it is taken as
    the dimension ROW count (one tiny count job on the slim key
    projection) — an overestimate under duplicate keys, which only
    makes the filter larger (lower fpp), never under-sized."""
    keys = dim.select(F.col(dim_key).alias("_k")).filter(F.col("_k").isNotNull())
    if n_keys is None:
        n_keys = keys.count()
    m_bits, k_hashes = bloom_parameters(n_keys, fpp)
    if m_bits // 8 > max_bitmap_bytes:
        raise ValueError(
            f"bloom bitmap would be {m_bits // 8} bytes for n_keys={n_keys}, "
            f"fpp={fpp} (cap {max_bitmap_bytes}); raise fpp or use the "
            "shuffle anti-join (referential_violations)"
        )
    words = (
        keys.select(F.explode(_positions(F.col("_k"), m_bits, k_hashes)).alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("long").alias("_word"),
            F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_bit"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_bit").alias("_bits"))
        .collect()
    )
    bitmap = np.zeros(m_bits // 64, dtype=np.int64)
    for r in words:
        bitmap[r["_word"]] = r["_bits"]
    return bitmap, m_bits, k_hashes


def bloom_member_probe(
    spark: SparkSession, bitmap: np.ndarray, m_bits: int, k_hashes: int
):
    """Callable(key: Column) -> boolean Column: True iff all k of the
    key's bits are set ("maybe member"); False is a certificate of
    absence. NULL keys probe False. The bitmap rides an explicit
    SparkContext broadcast (one transfer per executor)."""
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(BooleanType())
    def _probe(pos: pd.Series) -> pd.Series:
        bm = bc.value
        out = np.zeros(len(pos), dtype=bool)
        mask = pos.notna().to_numpy()
        if mask.any():
            arr = np.stack([np.asarray(p, dtype=np.int64) for p in pos[mask]])
            words = bm[arr >> 6]
            out[mask] = ((words >> (arr & 63)) & 1).all(axis=1)
        return pd.Series(out)

    def member(key: Column) -> Column:
        return F.coalesce(
            _probe(_positions(key, m_bits, k_hashes)), F.lit(False)
        )

    return member


def referential_violations_bloom(
    fact: DataFrame,
    fact_key: str | Column,
    dim: DataFrame,
    dim_key: str,
    fpp: float = 1e-3,
    exact: bool = False,
    keep_columns: list[str] | None = None,
    broadcast: bool | str = "auto",
    limit: int | None = None,
    n_keys: int | None = None,
) -> DataFrame:
    """Fact rows whose key is absent from ``dim``, via a Bloom bitmap
    of the dimension keys. Output shape mirrors
    ``referential_violations``: a (ref_key, n_rows) census per
    violating key by default, a bounded row dump with
    ``keep_columns``.

    ``exact=False``: certified violations only — one MAP-ONLY pass
    over the fact table (no shuffle of fact data besides the census
    groupBy on violating keys, which is proportional to violations,
    not table size). Flagged ⊆ exact violations; expected miss rate
    ``fpp`` of violating KEYS; deterministic across runs and
    parallelism (fixed-seed xxhash64).

    ``exact=True``: the bloom-positive residue is anti-joined against
    the dimension, so the union equals ``referential_violations``
    byte-for-byte — the bitmap acts as a join pre-filter that keeps
    certain violations out of the shuffle entirely.
    """
    spark = fact.sparkSession
    k = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    bitmap, m_bits, k_hashes = build_key_bloom(dim, dim_key, fpp, n_keys=n_keys)
    member = bloom_member_probe(spark, bitmap, m_bits, k_hashes)

    slim = fact.select(k.alias("ref_key"), *(keep_columns or []))
    flagged = slim.withColumn("_maybe", member(F.col("ref_key")))
    viol = flagged.filter(~F.col("_maybe")).drop("_maybe")
    if exact:
        dim_keys = maybe_broadcast(
            dim.select(F.col(dim_key).alias("_dim_key")).dropDuplicates(), broadcast
        )
        resid = (
            flagged.filter(F.col("_maybe"))
            .drop("_maybe")
            .join(
                dim_keys,
                F.col("ref_key").eqNullSafe(F.col("_dim_key")),
                "left_anti",
            )
        )
        viol = viol.unionByName(resid)

    if keep_columns:
        out = viol.orderBy("ref_key")
        return out.limit(limit) if limit else out
    out = (
        viol.groupBy("ref_key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("ref_key")
    )
    return out.limit(limit) if limit else out
