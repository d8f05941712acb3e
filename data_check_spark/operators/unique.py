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
