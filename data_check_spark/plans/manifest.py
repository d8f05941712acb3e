"""Checkpoint manifest — resumable runs (north rule).

The reference has no resume story (batch click-driven Streamlit);
the north rule requires "resumable from a checkpointed manifest of
completed partitions with per-partition lineage and metrics".

Design: a directory of one small JSON file per completed partition
(``<manifest_dir>/<sanitized_partition>.json``). One-file-per-partition
makes completion marks atomic (file rename/creation) and append-only —
safe under concurrent writers and crash at any point: a partition is
either fully recorded or not at all. On resume, completed partitions
are read driver-side and excluded with a ``~col.isin(done)`` filter,
which Spark pushes down to the parquet/Iceberg scan (partition
pruning) so completed partitions are never re-read, let alone
re-processed.

This is driver-side bookkeeping by design — no Spark streaming state,
no custom commit protocol. At 10^12 rows the partition count is 10^3..
10^5 (daily/hourly × bucket), trivially driver-manageable.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Any


def _safe(name: str) -> str:
    """Collision-free filename for a partition value: the sanitized
    (and length-capped) form for human readability, plus an md5 prefix
    of the RAW value — sanitizing alone would collapse distinct
    partitions ('2024/01' vs '2024_01') onto one file, so the second
    mark_complete would silently destroy the first's record and its
    partition would be re-scheduled on every resume."""
    import hashlib

    raw = str(name)
    tag = hashlib.md5(raw.encode("utf-8")).hexdigest()[:8]
    return re.sub(r"[^A-Za-z0-9_.-]", "_", raw)[:80] + "-" + tag


class Manifest:
    def __init__(self, manifest_dir: str):
        self.dir = manifest_dir
        os.makedirs(manifest_dir, exist_ok=True)

    def completed(self) -> dict[str, dict[str, Any]]:
        """{partition_value: lineage record} for completed partitions."""
        out: dict[str, dict[str, Any]] = {}
        for fn in os.listdir(self.dir):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(self.dir, fn)) as f:
                rec = json.load(f)
            out[str(rec["partition"])] = rec
        return out

    def mark_complete(
        self,
        partition: Any,
        run_id: str,
        metrics: dict[str, Any] | None = None,
    ) -> None:
        """Atomically record a partition as complete (tmp + rename)."""
        rec = {
            "partition": str(partition),
            "run_id": run_id,
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "metrics": metrics or {},
        }
        path = os.path.join(self.dir, _safe(str(partition)) + ".json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, path)

    def pending(self, all_partitions: list[Any]) -> list[Any]:
        done = set(self.completed())
        return [p for p in all_partitions if str(p) not in done]

    def reset(self) -> None:
        for fn in os.listdir(self.dir):
            if fn.endswith(".json"):
                os.remove(os.path.join(self.dir, fn))
