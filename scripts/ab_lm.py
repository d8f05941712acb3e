"""A/B: bigram-LM quality scoring cost (operators/lm) — the price of
the CCNet fluency signal at corpus scale.

Input: the pre-materialized synth pages table (build/pages_N.parquet,
shared with the scaling benches — reruns time the identical bytes).

Variants (alternating runs, median of N, bench-protocol cpu-ceiling
probes around the timed block):

* scan_floor — xxhash64(text) aggregated: the scan cost every variant
  pays.
* train_and_score — bigram_lm_scores self-trained end-to-end: ONE
  tokenize+explode pass (localCheckpoint), three model aggregations,
  the scoring join, the per-doc reduce.
* score_frozen — bigram_lm_scores against a PRE-TRAINED LM whose
  count tables are parquet on disk (the CCNet deployment shape:
  train once per reference corpus, score every new crawl) — isolates
  the scoring join from model training.

Reported: per-variant medians, docs/sec for both LM paths, µs/row
over the scan floor, plus a mean_p sanity envelope asserted in-run.

Usage: python scripts/ab_lm.py [n_rows] [reps]
Appends one JSON line to BENCH/AB_LM.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F

from bench_scaling import cpu_ceiling
from data_check_spark.operators.lm import bigram_lm, bigram_lm_scores, load_bigram_lm, save_bigram_lm
from data_check_spark.session import get_spark
from data_check_spark.sources.synth import synth_pages


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-lm", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    build = os.path.join(REPO, "build")
    os.makedirs(build, exist_ok=True)
    path = f"{build}/pages_{n_rows}.parquet"
    if not os.path.exists(path):
        synth_pages(spark, n_rows, partitions=32).write.parquet(path)
    # compact int64 doc ids: the bigram frame is O(tokens) rows each
    # carrying the doc id, so a ~36-char url per row triples the
    # checkpoint footprint vs an 8-byte hash (measured: the url-keyed
    # run OOMs a 32 GB heap at 1M docs x ~134 tokens; the hash-keyed
    # run fits) — at production scale map urls to int64 ids first
    pg = spark.read.parquet(path).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )

    lm_dir = f"{build}/lm_{n_rows}"
    if os.path.exists(lm_dir):
        shutil.rmtree(lm_dir)
    save_bigram_lm(bigram_lm(pg, "doc_id", "text"), lm_dir)
    frozen = load_bigram_lm(spark, lm_dir)

    def agg(out):
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bigrams").alias("nb"),
            F.avg("mean_p").alias("mp"),
        )

    variants = {
        "scan_floor": lambda: pg.agg(
            F.bit_xor(F.xxhash64("text")).alias("s"), F.count(F.lit(1)).alias("n")
        ),
        "train_and_score": lambda: agg(bigram_lm_scores(pg, "doc_id", "text")),
        "score_frozen": lambda: agg(bigram_lm_scores(pg, "doc_id", "text", lm=frozen)),
    }

    c_pre = cpu_ceiling(8, 32)
    sanity = None
    for v, fn in variants.items():  # warmup
        rows = fn().collect()
        if v == "train_and_score":
            sanity = rows[0].asDict()
    assert sanity["n"] > 0 and 0.0 < sanity["mp"] < 1.0, sanity
    times: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(reps):
        for v, fn in variants.items():
            t0 = time.perf_counter()
            fn().collect()
            times[v].append(round(time.perf_counter() - t0, 3))
    c_post = cpu_ceiling(8, 32)

    med = {v: statistics.median(ts) for v, ts in times.items()}
    rec = {
        "n_rows": n_rows,
        "reps": reps,
        "medians_sec": med,
        "all_runs_sec": times,
        "docs_per_sec_train_and_score": round(n_rows / med["train_and_score"], 1),
        "docs_per_sec_score_frozen": round(n_rows / med["score_frozen"], 1),
        "train_and_score_us_per_row_over_floor": round(
            (med["train_and_score"] - med["scan_floor"]) / n_rows * 1e6, 2
        ),
        "score_frozen_us_per_row_over_floor": round(
            (med["score_frozen"] - med["scan_floor"]) / n_rows * 1e6, 2
        ),
        "scored_docs": sanity["n"],
        "sum_bigrams": sanity["nb"],
        "corpus_mean_p": round(sanity["mp"], 6),
        "ceiling_pre": c_pre,
        "ceiling_post": c_post,
    }
    line = json.dumps(rec)
    with open(os.path.join(REPO, "BENCH", "AB_LM.jsonl"), "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
