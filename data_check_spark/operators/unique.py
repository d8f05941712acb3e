"""PK / url uniqueness — check #2 of the reference's contract.

Reference: ``GROUP BY pk HAVING COUNT(*) > 1``
(``/root/reference/data_check/processors/bigquery.py:94-102``); empty
result = pass (``data_processor.py:257-266``).

Scale design (north rule: "uniqueness checks on url via salted
hash-partitioned aggregation"):

* ``groupBy(key).count()`` already gets Spark's map-side partial
  aggregation — each task emits ≤1 partial row per key, so a hot key
  contributes at most (#map tasks) rows to its reduce partition. Fine
  at local[32]; at 1000-executor scale #map-tasks is ~10^5 and a
  handful of hot keys can still pile 10^5 partial rows onto single
  reducers.
* The **salted two-phase** plan spreads those partials: phase 1 groups
  on (salt, key) where salt is a per-row label independent of the key
  (``monotonically_increasing_id() % S``), phase 2 re-aggregates per
  key. The final counts are identical for any salt assignment, so the
  result is deterministic at any parallelism even though the salt
  itself is partition-layout-dependent.
* Violation output is sorted by key → deterministic ordering for
  writes/goldens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def uniqueness_violations(
    df: DataFrame,
    key: str | Column,
    salted: bool = True,
    salt_buckets: int = 64,
    limit: int | None = None,
) -> DataFrame:
    """Keys occurring more than once, with their multiplicity.

    Returns columns (key_value, n), sorted by key. ``salted`` selects
    the two-phase plan; both plans produce identical results.
    """
    k = F.col(key) if isinstance(key, str) else key
    slim = df.select(k.alias("key_value"))
    if salted:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
        counts = (
            slim.groupBy(salt.alias("_salt"), F.col("key_value"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .groupBy("key_value")
            .agg(F.sum("_n").alias("n"))
        )
    else:
        counts = slim.groupBy("key_value").agg(F.count(F.lit(1)).alias("n"))
    out = counts.filter(F.col("n") > 1).orderBy("key_value")
    if limit:
        out = out.limit(limit)
    return out


def fd_violations(
    df: DataFrame,
    determinant: str | Column,
    dependents: list[str] | tuple[str, ...],
    limit: int | None = None,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Functional-dependency violations: values of ``determinant``
    observed with MORE than one distinct combination of ``dependents``
    — e.g. ``fd_violations(pages, "url", ["text"])`` asserts the
    BASELINE.json per-row invariant (byte-identical extracted text per
    url) as a data check. Generalizes uniqueness: a unique key is the
    FD ``key -> all columns`` with every group of size 1.

    Returns (key_value, n_variants, n_rows) sorted by key, where
    ``n_variants`` counts distinct dependent combinations (an all-NULL
    combination counts as ONE variant — byte-identical means "both
    NULL or both equal", fail-closed) and ``n_rows`` the group size.

    Scale design (10^12 rows, violations rare):

    * Phase 1 prunes by hash: groupBy(xxhash64(det)) counting distinct
      xxhash64(deps) — the shuffle carries two 8-byte hashes per row
      (map-side partially aggregated), never url/text bytes.
    * Phase 2 re-scans only rows whose determinant hash is a
      candidate (left-semi against the bounded candidate set,
      broadcast by default) and recounts BY VALUE, so a determinant
      hash collision can never fabricate a violation.
    * One-sided caveat: a collision of two DISTINCT dependent values
      under xxhash64 *within one determinant group* would mask that
      group in phase 1 (~2^-64 per pair — the standard
      hash-fingerprint trade, same class as dedup_exact's md5).
    """
    det = F.col(determinant) if isinstance(determinant, str) else determinant
    deps = [F.col(c) for c in dependents]
    h_det, h_dep = F.xxhash64(det), F.xxhash64(*deps)
    cand = (
        df.groupBy(h_det.alias("_hd"))
        .agg(F.count_distinct(h_dep).alias("_v"))
        .filter(F.col("_v") > 1)
        .select("_hd")
    )
    build = F.broadcast(cand) if broadcast_candidates else cand
    out = (
        df.select(
            det.alias("key_value"),
            F.struct(*deps).alias("_dep"),
            h_det.alias("_hd"),
        )
        .join(build, "_hd", "left_semi")
        .groupBy("key_value")
        .agg(
            F.count_distinct("_dep").alias("n_variants"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .filter(F.col("n_variants") > 1)
        .orderBy("key_value")
    )
    if limit:
        out = out.limit(limit)
    return out


def remediation_query(df: DataFrame, key: str) -> str:
    """The GROUP-BY query a user can run to see the offending keys —
    the reference embeds exactly this in its failure message
    (``data_processor.py:263-264``)."""
    src = "<table>"
    return (
        f"SELECT {key}, count(*) AS n FROM {src} "
        f"GROUP BY {key} HAVING count(*) > 1 ORDER BY n DESC"
    )


def uniqueness_check(df: DataFrame, key: str) -> tuple[bool, int, str | None]:
    """Pass/fail à la the reference gate (data_processor.py:257-266):
    empty violation set = pass. Returns (passed, n_violating_keys,
    message); on failure the message carries the offending-keys query
    like the reference's remediation hint (data_processor.py:263-264)."""
    n = uniqueness_violations(df, key, salted=False).count()
    if n == 0:
        return True, 0, None
    msg = (
        f"uniqueness check failed: {n} value(s) of `{key}` occur more than once. "
        f"Inspect them with: {remediation_query(df, key)}"
    )
    return False, n, msg
