"""Measure the text-metric fusion question (VERDICT r3 #5 / r2 #6):

A. does codegen subexpression elimination already dedupe REPEATED
   regex subtrees inside one Project (token_count appears 2x and
   _nonspace_chars 3x inside quality_score)?
B. how much does running token_stats + quality + langid as ONE
   projection (one scan) save vs three independent scans?

Usage: python scripts/profile_textfuse.py <cores> <pages_parquet> [reps]
Prints one JSON line per variant: seconds per rep (median).
"""
from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from data_check_spark.functions.textstats import (  # noqa: E402
    bpe_ish_token_count,
    digit_ratio,
    lang_guess,
    mean_word_length,
    punct_ratio,
    quality_score,
    token_count,
)


def main() -> None:
    cores, path = int(sys.argv[1]), sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = (
        SparkSession.builder.appName(f"dcs-fuse-{cores}")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(path).select("url", "text")
    n = df.count()
    t = F.col("text")

    def tm(name, mk):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            # count() would prune the projection (memory: count() prunes
            # aggs) -> reduce through a cheap consuming aggregate instead
            mk().agg(F.count(F.lit(1)), F.bit_xor(F.xxhash64(*[c for c in mk().columns if c != "url"]))).collect()
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        print(json.dumps({"variant": name, "sec": round(med, 3),
                          "us_per_row": round(med / n * 1e6, 2), "all": [round(x, 3) for x in ts]}),
              flush=True)

    # A: repeated-subtree question. quality_score has token_count x2 +
    # nonspace x3 internally; compare against a hand-flattened variant
    # where each raw counter appears exactly once via nested selects
    # that Catalyst WILL collapse (so: same plan if CSE works).
    tm("quality_as_is", lambda: df.select("url", quality_score(t).alias("q")))

    # raw counters only (lower bound: each distinct regex once)
    def raw_counters():
        return df.select(
            "url",
            F.regexp_count(t, F.lit(r"\S+")).alias("ntok"),
            (F.length(t) - F.regexp_count(t, F.lit(r"\s"))).alias("nsp"),
            F.regexp_count(t, F.lit(r"[.,;:!?'\"()\[\]{}-]")).alias("np"),
            F.regexp_count(t, F.lit(r"[0-9]")).alias("nd"),
            F.regexp_count(F.lower(t), F.lit(r"\b(the|and|of|to|a|in|is|that|it|for)\b")).alias("nsw"),
        )
    tm("raw_counters_once", raw_counters)

    # B: three separate scans vs one fused projection
    def sep():
        a = df.select("url", token_count(t).alias("n_tokens"),
                      bpe_ish_token_count(t).alias("n_bpe"),
                      F.round(mean_word_length(t), 4).alias("mwl"),
                      F.round(punct_ratio(t), 6).alias("pr"),
                      F.round(digit_ratio(t), 6).alias("dr"))
        b = df.select("url", quality_score(t).alias("q"))
        c = df.select("url", lang_guess(t).alias("lg"))
        return a.join(b, "url").join(c, "url")
    def fused():
        return df.select("url", token_count(t).alias("n_tokens"),
                         bpe_ish_token_count(t).alias("n_bpe"),
                         F.round(mean_word_length(t), 4).alias("mwl"),
                         F.round(punct_ratio(t), 6).alias("pr"),
                         F.round(digit_ratio(t), 6).alias("dr"),
                         quality_score(t).alias("q"),
                         lang_guess(t).alias("lg"))
    # separate: measure as three independent jobs (the real usage shape)
    def tm_sep():
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for mk in (
                lambda: df.select("url", token_count(t).alias("x1"), bpe_ish_token_count(t).alias("x2"),
                                  F.round(mean_word_length(t), 4).alias("x3"),
                                  F.round(punct_ratio(t), 6).alias("x4"), F.round(digit_ratio(t), 6).alias("x5")),
                lambda: df.select("url", quality_score(t).alias("q")),
                lambda: df.select("url", lang_guess(t).alias("lg")),
            ):
                d = mk()
                d.agg(F.count(F.lit(1)), F.bit_xor(F.xxhash64(*[c for c in d.columns if c != "url"]))).collect()
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        print(json.dumps({"variant": "three_separate_scans", "sec": round(med, 3),
                          "us_per_row": round(med / n * 1e6, 2), "all": [round(x, 3) for x in ts]}),
              flush=True)
    tm_sep()
    tm("one_fused_projection", fused)
    spark.stop()


if __name__ == "__main__":
    main()
