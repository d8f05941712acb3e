"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Measurement protocol (the host is intermittently oversubscribed —
pure-CPU scaling ceilings between 0.41 and 1.0 were observed within an
hour, which made earlier single-run benches contradict plan-level
facts): one UNTIMED warmup sweep, then DCS_BENCH_REPS (default 3) full
timed sweeps; each query reports its MEDIAN across sweeps and `value`
is the sum of medians. The whole timed block is sandwiched by the same
concurrent pure-CPU sha256 ceiling probes the scaling bench uses
(scripts/bench_scaling.py) and retried up to DCS_BENCH_ATTEMPTS
(default 4) until a quiet window — both probes in [0.8, 1.15] (a
probe ABOVE ~1 means the low-parallelism probe itself was disturbed)
AND the per-sweep total-time spread <= 1.2 (edge probes cannot see
mid-run interference). An ACCEPTED attempt (the stop criterion above)
strictly outranks any non-accepted one; within a class attempts rank
by bench_scaling's att_score (spread first, probe distance from 1.0
second) — one protocol for the headline and scaling benches; probe
readings, spread, and the accepted flag ship in the JSON so a noisy
number is visibly noisy.

Each query is forced with a noop-format write (full computation, no
driver collect overhead — and no count(): Catalyst PRUNES aggregate
expressions under count()). ``pages_suite`` is the north-rule
headline: the full validation CheckSuite over a pre-materialized
synthesized web-pages table (PAGES_N rows, deterministic) — its
docs/sec is reported separately. Scaling evidence (local[8] vs
local[32]) lives in scripts/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__ as entry
from data_check_spark.session import get_spark

HEADLINE = [
    "pk_census",
    "column_match_ratios",
    "row_diff",
    "unique_violations",
    "refint_violations",
    "stats_documents",
    "psi_lang",
    "ks_nchars",
    "dedup_exact",
    "minhash_pairs",
    "knn_bruteforce",
    "token_stats",
    "quality_scores",
    "langid",
    "fingerprint",
    "events_hourly",
    "tpch_q1",
    "window_topk_orders",
    # round-4 additions — new keys, so r<=3 medians stay comparable
    # per-query; the TOTAL grows by construction when queries are added
    "repetition_metrics",
    "crossdoc_ngram",
    "train_split",
    "tdigest_quantiles",
    # round-5 additions (same comparability note)
    "asof_join_events",
    "range_join_events",
    "sessionize_events",
    "pii_scan",
    "contamination",
    "outlier_counts",
    "pack_contract",
    "embedding_stats",
    "fd_violations",
    "url_canon",
    "changed_partitions",
    # round-5-late additions (same comparability note)
    "refint_hashed",
    "suite_drift_profile",
    "minhash_incremental",
    "dedup_incremental",
    "col_profile",
    "suite_profile_verdicts",
    "suggest_constraints",
    "metric_anomalies",
    "quarantine",
    "quarantine_gopher",
    "line_dedup_stats",
    "line_dedup_strip",
    "domain_cap",
    "suite_linedup_verdicts",
    "neardup_strip",
    "encoding_scan",
    "quarantine_encoding",
    "lang_mismatch",
    "token_budget_cut",
    "suite_bytes_verdicts",
    "text_normalize",
    "refint_bloom",
    # round-5-final additions (same comparability note)
    "lm_scores",
    "shard_manifest",
]

PAGES_N = int(os.environ.get("DCS_BENCH_PAGES_N", "500000"))
REPS = int(os.environ.get("DCS_BENCH_REPS", "3"))
ATTEMPTS = int(os.environ.get("DCS_BENCH_ATTEMPTS", "4"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _materialize_pages(spark, n: int, tmp: str) -> tuple:
    """Synthesize the pages tables ONCE, outside every timed region:
    the suite makes several passes over its input and re-paying the
    synthesis expressions per pass measures the generator, not the
    engine. Scanning parquet is also what the north rule describes."""
    from pyspark.sql import functions as F

    from data_check_spark.sources.synth import synth_pages, synth_pages_v2

    synth_pages(spark, n).write.mode("overwrite").parquet(f"{tmp}/pages")
    synth_pages_v2(spark, n).write.mode("overwrite").parquet(f"{tmp}/pages_v2")
    df = spark.read.parquet(f"{tmp}/pages").withColumn(
        "warc_day", F.to_date("warc_ts")
    )
    ref = spark.read.parquet(f"{tmp}/pages_v2")
    return df, ref


def run_pages_suite(spark, df, ref) -> float:
    """One timed run of the full validation suite → seconds."""
    from data_check_spark.runner import default_pages_suite

    suite = default_pages_suite(with_drift=True)
    t0 = time.perf_counter()
    res = suite.run(spark, df, "warc_day", reference_df=ref)
    _force(res.verdicts)
    for v in res.violations.values():
        _force(v)
    sec = time.perf_counter() - t0
    res.unpersist()
    return sec


def run_pages_fd_check(spark, df, _ref) -> float:
    """One timed run of the url → text functional-dependency gate on
    the pages table (its own entry so pages_suite's composition — and
    cross-round comparability — is unchanged)."""
    from data_check_spark.plans.suite import CheckSuite, FunctionalDependencyCheck

    suite = CheckSuite([FunctionalDependencyCheck("url", ("text",))])
    t0 = time.perf_counter()
    res = suite.run(spark, df, "warc_day")
    _force(res.verdicts)
    _force(res.violations["fd:url"])
    sec = time.perf_counter() - t0
    res.unpersist()
    return sec


def one_sweep(spark, qs, sf_dir, pages, timings: dict) -> None:
    """One full timed pass over every headline query + the suite;
    appends each query's seconds to timings[name]."""
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        timings.setdefault(name, []).append(time.perf_counter() - t0)
    timings.setdefault("pages_suite", []).append(run_pages_suite(spark, *pages))
    timings.setdefault("pages_fd_check", []).append(run_pages_fd_check(spark, *pages))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("dcs-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from bench_scaling import (  # shared quiet-window protocol
        cpu_ceiling,
        window_accepted,
        window_score,
    )

    import shutil
    import tempfile

    qs = entry.queries()
    tmp = tempfile.mkdtemp(prefix="dcs_bench_pages_")
    try:
        pages = _materialize_pages(spark, PAGES_N, tmp)

        # untimed warmup: JIT, parquet footer caches, Python workers
        warm: dict = {}
        one_sweep(spark, qs, sf_dir, pages, warm)

        # attempt selection mirrors scripts/bench_scaling.bench_pair
        # exactly (one protocol for headline and scaling benches):
        # rank by the timed sweeps' own steadiness first — edge probes
        # cannot see MID-RUN interference — then by probe distance
        # from the ideal 1.0 (a reading ABOVE ~1 means the
        # low-parallelism probe itself was disturbed; observed 1.25
        # right before a 50%-slow run). Accept only a quiet window
        # (both probes in [0.8, 1.15]) with steady sweeps (total-time
        # spread <= 1.2), else retry.
        def sweep_totals(timings: dict) -> list:
            reps = len(next(iter(timings.values())))
            return [sum(t[i] for t in timings.values()) for i in range(reps)]

        def att_score(att: dict) -> tuple:
            # shared protocol scoring (scripts/bench_scaling.py):
            # acceptance dominates, then sweep steadiness, then probe
            # distance from 1.0
            return window_score(
                att["accepted"], att["sweep_spread"],
                att["ceiling_pre"], att["ceiling_post"],
            )

        # probe width capped to the host: asking for CPUs the box
        # doesn't have would leave probe workers unpinned (see
        # bench_scaling._sha_worker) and distort the ceiling reading
        ncpu = os.cpu_count() or 8
        probe_lo, probe_hi = min(8, max(2, ncpu // 4)), min(32, ncpu)
        best = None
        for attempt in range(ATTEMPTS):
            c_pre = cpu_ceiling(probe_lo, probe_hi)
            timings: dict = {}
            for _ in range(REPS):
                one_sweep(spark, qs, sf_dir, pages, timings)
            c_post = cpu_ceiling(probe_lo, probe_hi)
            totals = sweep_totals(timings)
            spread = round(max(totals) / min(totals), 3)
            att = {
                "timings": timings,
                "ceiling_pre": round(c_pre, 3),
                "ceiling_post": round(c_post, 3),
                "sweep_spread": spread,
                "attempt": attempt,
                "accepted": window_accepted(c_pre, c_post, spread),
            }
            if best is None or att_score(att) > att_score(best):
                best = att
            if att["accepted"]:
                break
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    medians = {
        name: round(statistics.median(secs), 3)
        for name, secs in best["timings"].items()
    }
    total = sum(medians.values())
    docs_per_sec = round(PAGES_N / medians["pages_suite"], 1)

    print(
        json.dumps(
            {
                "metric": "headline queries + validation-suite throughput",
                "value": round(total, 3),
                "unit": "sec",
                "queries": medians,
                "sf": sf,
                "pages_n": PAGES_N,
                "docs_per_sec": docs_per_sec,
                "protocol": {
                    "reps": REPS,
                    "stat": "median",
                    "warmup": 1,
                    "ceiling_pre": best["ceiling_pre"],
                    "ceiling_post": best["ceiling_post"],
                    "sweep_spread": best["sweep_spread"],
                    "attempt": best["attempt"],
                    "accepted": best["accepted"],
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
