"""A/B: does exclusive_rows' build-side dropDuplicates() pay for
itself? (VERDICT r3 'What's wrong' observation #4.)

The anti-join is indifferent to duplicate build keys, so the
pre-dedup's only value is shrinking the build side (one extra
aggregation exchange vs a smaller broadcast/shuffle build). On a
low-duplicate key column (the common case: pk-ish urls, ~2% dups) the
aggregation removes almost nothing; on a high-duplicate build side it
collapses the exchange.

Protocol: alternating runs, median of 3 per variant, same session,
noop-write force, identical results asserted once per variant pair.
Usage: python scripts/ab_exclusive_dedup.py [n_pages]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_check_spark.operators.rowdiff import common_columns  # noqa: E402
from data_check_spark.session import get_spark  # noqa: E402


def variant(df1, df2, pk, dedup: bool):
    keys = df2.select(pk)
    if dedup:
        keys = keys.dropDuplicates()
    anti = df1.join(keys, on=pk, how="left_anti")
    common = [n for n, _ in common_columns(df1, df2)]
    proj = [F.col(pk)] + [F.col(n).alias(f"{n}__1") for n in common]
    return anti.select(*proj).orderBy(pk).limit(500)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("ab-excl", master="local[32]", shuffle_partitions=32)
    p1 = f"{REPO}/build/pages_{n}.parquet"
    p2 = f"{REPO}/build/pages_v2_{n}.parquet"
    df1 = spark.read.parquet(p1)
    df2 = spark.read.parquet(p2)

    a = variant(df1, df2, "url", dedup=True)
    b = variant(df1, df2, "url", dedup=False)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]

    times: dict[str, list[float]] = {"dedup": [], "nodedup": []}
    for _ in range(2):  # warmup both
        a.write.format("noop").mode("overwrite").save()
        b.write.format("noop").mode("overwrite").save()
    for _ in range(3):
        for name, df in (("dedup", a), ("nodedup", b)):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    out = {
        "n_pages": n,
        "dedup_median_s": round(statistics.median(times["dedup"]), 3),
        "nodedup_median_s": round(statistics.median(times["nodedup"]), 3),
        "runs": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
