"""Local stand-in for the driver's correctness gate: runs every
queries() entry on Spark and its oracle_sql() on DuckDB at the given
sf dir, normalizes (column order by name, row order by all values),
and compares exactly. Usage: python scripts/check_parity.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from data_check_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Mirrors the driver's canonicalizer EXACTLY: sort columns by
    name, sort rows by all values with pandas. NO masking of array
    columns — the driver's pandas sort throws `unhashable type: list`
    on them (CORRECTNESS_r01: simhash_neardup), so a query() entry
    returning an array column must FAIL here too."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype) in ("Int64", "Int32", "int32"):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name would otherwise skip EVERY check and print a
        # false 'all queries match' — the gate must never verify
        # nothing and report green
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        # the driver canonicalizes rows-only results too — an array
        # column crashes it even without an oracle
        try:
            sdf_n = normalize(sdf)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: driver canonicalizer would crash: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        s, o = sdf_n, normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(s)} vs {len(o)}")
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            print(f"PASS  {name}: {len(s)} rows")
        except AssertionError as e:
            failures.append(name)
            msg = str(e).splitlines()
            print(f"FAIL  {name}: value mismatch: " + " | ".join(msg[:6]))
    print()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
