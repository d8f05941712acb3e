"""A/B: html → text extraction cost (functions/html.html_to_text) —
the per-row price of asserting the input_hint invariant from the raw
html payload instead of trusting the stored text column.

Input: the synth pages table upgraded to a FULL-FIDELITY html payload
(title + style + script + comment + the entity-escaped full text, not
the 64-char prefix synth_pages embeds) so the measured cost reflects
a real page body, not a stub. Deterministic (pure function of url),
materialized to parquet once so reruns time the identical table.

Variants (alternating runs, median of N, bench-protocol cpu-ceiling
probes around the timed block):

* scan_floor — xxhash64(html) aggregated: the scan + hash cost every
  variant pays; subtracting it isolates the extraction expressions.
* extract — xxhash64(html_to_text_from_binary(html)) aggregated: scan
  + the full pipeline (4 regexp_replace + 7 replace + trim).
* extract_eq — count_if(extraction = expected): the exact predicate
  shape ExprCheck('html_text_invariant') rides the fused stats pass
  with (also validates the invariant holds on every row in-run).

Reported: per-variant medians, extraction µs/row over the scan floor,
and the invariant holding (n_bad == 0).

Usage: python scripts/ab_html_extract.py [n_rows] [reps]
Appends one JSON line to BENCH/AB_HTML_EXTRACT.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F

from bench_scaling import cpu_ceiling
from data_check_spark.functions.html import html_to_text_from_binary
from data_check_spark.session import get_spark
from data_check_spark.sources.synth import synth_pages


def rich_pages(spark, n: int):
    """synth pages with a full-fidelity html payload: the ENTIRE text
    entity-escaped inside a realistic wrapper (head/style/script/
    comment), NULL when text is NULL — the same construction the
    html_extract oracle plants, at full text length."""
    p = synth_pages(spark, n, partitions=32)
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    page = F.concat(
        F.lit("<html><head><title>"), F.coalesce(F.col("lang"), F.lit("")),
        F.lit('</title><style>p{margin:0}</style>'
              '<script>if(1<2){var x="<p>"}</script></head><body><!-- '),
        F.col("url"),
        F.lit(" --><p>"), esc, F.lit("</p></body></html>"),
    )
    return p.withColumn("html", page.cast("binary"))


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-html", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    build = os.path.join(REPO, "build")
    os.makedirs(build, exist_ok=True)
    path = f"{build}/pages_html_{n_rows}.parquet"
    if not os.path.exists(path):
        rich_pages(spark, n_rows).write.parquet(path)
    pg = spark.read.parquet(path)

    extraction = html_to_text_from_binary(F.col("html"))
    # the invariant's expected side: title(lang) + collapsed text
    expected = F.trim(
        F.regexp_replace(
            F.concat(F.coalesce(F.col("lang"), F.lit("")), F.lit(" "), F.col("text")),
            "[ \t\n\f\r]+", " ",
        )
    )
    variants = {
        "scan_floor": lambda: pg.agg(
            F.bit_xor(F.xxhash64("html")).alias("s"), F.count(F.lit(1)).alias("n")
        ),
        "extract": lambda: pg.agg(
            F.bit_xor(F.xxhash64(extraction)).alias("s"), F.count(F.lit(1)).alias("n")
        ),
        "extract_eq": lambda: pg.agg(
            F.count_if(
                F.col("html").isNotNull() & ~(extraction == expected)
            ).alias("n_bad"),
            F.count(F.lit(1)).alias("n"),
        ),
    }

    c_pre = cpu_ceiling(8, 32)
    for fn in variants.values():  # warmup
        fn().collect()
    times: dict[str, list[float]] = {v: [] for v in variants}
    n_bad = None
    for _ in range(reps):
        for v, fn in variants.items():
            t0 = time.perf_counter()
            rows = fn().collect()
            times[v].append(round(time.perf_counter() - t0, 3))
            if v == "extract_eq":
                n_bad = rows[0]["n_bad"]
    c_post = cpu_ceiling(8, 32)

    med = {v: round(statistics.median(ts), 3) for v, ts in times.items()}
    us_per_row = round((med["extract"] - med["scan_floor"]) * 1e6 / n_rows, 2)
    out = {
        "input": f"pages_html_{n_rows}",
        "medians": med,
        "extract_us_per_row_over_floor": us_per_row,
        "invariant_n_bad": n_bad,
        "all_runs": times,
        "ceiling_pre": round(c_pre, 3),
        "ceiling_post": round(c_post, 3),
    }
    line = json.dumps(out)
    print(line, flush=True)
    with open(os.path.join(REPO, "BENCH", "AB_HTML_EXTRACT.jsonl"), "a") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
