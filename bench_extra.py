"""Targeted per-query profiling harness for the optimization round
(guide §1.4 noop-sink isolation). NOT the frozen driver bench — see
bench.py for the measured protocol. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [--reps N] [--warmup N] [--explain DIR] \
        [--tag TAG] q1 q2 ...

Times each named queries() entry with a noop-format write (full
computation, no sink cost), prints one JSON line per query with all
samples and the median, and optionally dumps .explain("formatted") to
DIR/<q>_<tag>.txt. `pages_suite` / `pages_fd_check` are supported via
the same pre-materialized parquet pages tables bench.py uses.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as entry
from data_check_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--explain", default=None, help="dir for plan dumps")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "dcs-bench-extra", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    pages = None
    if any(n.startswith("pages_") for n in args.names):
        import tempfile

        from bench import _materialize_pages, run_pages_fd_check, run_pages_suite

        tmp = tempfile.mkdtemp(prefix="dcs_bx_pages_")
        pages = _materialize_pages(spark, int(os.environ.get("DCS_BENCH_PAGES_N", "500000")), tmp)

    for name in args.names:
        if name == "pages_suite":
            fn = lambda: run_pages_suite(spark, *pages)  # noqa: E731
        elif name == "pages_fd_check":
            fn = lambda: run_pages_fd_check(spark, *pages)  # noqa: E731
        else:
            q = qs[name]

            def fn(q=q):
                t0 = time.perf_counter()
                _force(q(spark, sf_dir))
                return time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"bx:{name}")
        if args.explain and name not in ("pages_suite", "pages_fd_check"):
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        for _ in range(args.warmup):
            fn()
        secs = [round(fn(), 3) for _ in range(args.reps)]
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {"q": name, "samples": secs, "median": round(statistics.median(secs), 3)}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
