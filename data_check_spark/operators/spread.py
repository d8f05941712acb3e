"""Scale-adaptive CPU spreading for few-split sources.

Parquet scan parallelism is bounded by ROW GROUPS, not by
``spark.sql.files.maxPartitionBytes``: a row group belongs to exactly
one split, so a table written as one file with one row group is
scanned by ONE task no matter how many cores the cluster has. For a
map-only operator whose per-row work dominates (regex counters, md5
row hashes, shingling), that serializes the whole query on one core —
the "input skew: one huge unsplittable file" case of the optimization
playbook (§2.5), and exactly the situation the benchmark's
driver-generated tables are in (documents: 50k rows, ONE row group).

``spread_cpu`` repartitions ONLY when the source actually under-splits
(scan partitions < defaultParallelism). At 100 TB the source supplies
thousands of row groups, the condition is false, and no shuffle is
added — so this is not a local-mode constant but a guard that fires
precisely when a shuffle of the (small, by construction) input is
cheaper than serial CPU. Partitioning is HASH on the caller's id
column (deterministic under task retry — guide §2.5 warns against
rand-derived keys; round-robin repartition would also pay the
sort-before-repartition pass).

The minhash operator has used this pattern since round 4
(operators/dedup.py: "spread it over all cores even when the source
has few input splits"); this module just makes it conditional and
shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_cpu(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition ``df`` to defaultParallelism on ``keys`` when
    (and only when) its plan yields fewer scan partitions — the
    few-row-group source case. No-op (returns ``df`` unchanged, no
    exchange in the plan) when the source is already well-split."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, *keys) if keys else df.repartition(par)
