"""Memory-bandwidth ceiling evidence for the scaling argument in
BENCH/BASELINE.md: measures aggregate DRAM read bandwidth at 1, 8 and
32 processes (taskset-pinned like the Spark runs). A single box shares
ONE memory bus between the local[8] and local[32] runs; a real N→4N
executor scale-up multiplies buses with nodes. If aggregate bandwidth
stops growing past ~8 processes, the scan-bound share of the suite
cannot speed up 4× on this box no matter how parallel the code is —
that residue is what a multi-node cluster (the north rule's actual
deployment) parallelizes trivially.

Each worker repeatedly reduces a 512 MiB float64 array (far beyond
L3) with numpy; bandwidth = bytes touched / wall time, summed over
workers. Prints one JSON line.

Usage: python scripts/bench_membw.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

ARR_BYTES = 512 * 1024 * 1024
REPS = 6


def _worker(core: int, q: "mp.Queue") -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    a = np.ones(ARR_BYTES // 8, dtype=np.float64)
    a.sum()  # touch/fault pages before timing
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(REPS):
        s += float(a.sum())
    dt = time.perf_counter() - t0
    q.put((ARR_BYTES * REPS) / dt / 1e9)


def measure(n_procs: int) -> float:
    q: "mp.Queue" = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, q)) for i in range(n_procs)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total


def main() -> None:
    out = {}
    for n in (1, 8, 32):
        # median of 3 — same discipline as the Spark scaling bench
        runs = sorted(measure(n) for _ in range(3))
        out[f"gbps_{n}p"] = round(runs[1], 2)
    out["scale_8_to_32"] = round(out["gbps_32p"] / out["gbps_8p"], 3)
    out["note"] = (
        "aggregate DRAM read bandwidth; scale_8_to_32 is the hard ceiling "
        "on any scan-bound component's 8->32-core speedup on this box"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
