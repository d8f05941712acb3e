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

#: Only add the exchange when every core would receive at least this
#: many SOURCE-FILE bytes: below it, the repartition's fixed cost
#: (shuffle write/read + extra stage) exceeds the serial map CPU it
#: saves — measured at sf0.1, where ~0.5-2.5 MB inputs spread over 32
#: cores REGRESSED the very queries spreading wins at sf1.0
#: (row_diff 0.56→1.07 s, events_hourly 0.52→1.02 s, line_dedup_stats
#: 0.65→1.14 s). 96 KB/core ≈ 3 MB on 32 cores separates the two
#: regimes with ~2x margin each way (sf0.1 inputs ≤ 2.5 MB, sf1.0
#: inputs ≥ 5.7 MB). Actual file bytes, not Catalyst's estimate: the
#: default-size column arithmetic undercounts text columns so badly
#: that a big text table and a small wide table are inseparable.
MIN_BYTES_PER_SLOT = 96 << 10


def _input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the frame's input files; None when the
    source is not file-backed or a size is unreadable. Only called for
    UNDER-SPLIT sources (few files by construction), so the per-file
    stat loop is bounded — the partition-count guard short-circuits
    before this on any well-split table."""
    import os

    files = df.inputFiles()
    if not files:
        return None
    total = 0
    for f in files:
        if not f.startswith(("file:", "/")):
            return None  # remote FS: size unknown here, assume big
        # POSIX stat tolerates the repeated leading slashes of
        # file:///x URIs, so stripping the scheme alone suffices
        path = f[5:] if f.startswith("file:") else f
        try:
            total += os.stat(path).st_size
        except OSError:
            return None
    return total


def spread_cpu(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition ``df`` to defaultParallelism on ``keys`` when
    (and only when) its plan yields fewer scan partitions — the
    few-row-group source case — AND the input is big enough that each
    core gets real work (MIN_BYTES_PER_SLOT). No-op (returns ``df``
    unchanged, no exchange in the plan) otherwise. Unknown sizes
    (non-file sources, remote FS) count as big: the only cost of a
    wrong 'big' is one cheap exchange."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    size = _input_bytes(df)
    if size is not None and size < par * MIN_BYTES_PER_SLOT:
        return df
    return df.repartition(par, *keys) if keys else df.repartition(par)
