"""Metric-history anomaly gate — judge THIS run's metrics against the
audit trail of previous runs (the deequ anomaly-detection family:
absolute/relative change + robust median/MAD, re-expressed over this
engine's persisted verdict rows).

Threshold checks (plans/suite.py) gate against CONSTANTS a human chose;
the anomaly gate is the complementary direction: a metric can sit
comfortably inside its threshold while having just tripled — on a
10^12-row table that silent 3x is the incident. The audit table already
carries everything needed (every run appends per-(partition, column,
check) verdict rows with their raw ``metric`` — plans/audit.py), so the
gate is pure DataFrame math over audit rows: NO rescan of the data
table, and the frame it aggregates is |runs| x |keys| rows — orders of
magnitude smaller than the table no matter the scale.

Per key (partition, column, check) with history H = metrics of all
OTHER runs in the frame:

    median_H, MAD_H = median(H), median(|H - median_H|)
    tolerance      = greatest(k * MAD_H, min_abs, min_rel * |median_H|)
    passed         = |metric_now - median_H| <= tolerance

MAD (not stddev) so one historical bad run doesn't poison the baseline;
``min_abs`` / ``min_rel`` keep a constant history (MAD = 0) from
flagging float dust. Keys with fewer than ``min_history`` prior runs
pass with ``n_history`` exposed — a new pipeline must not fail its
first morning; tighten ``min_history`` once the trail exists.

The reference has no counterpart (it compares two tables, not a table
against its own past); lineage: deequ's AnomalyDetection /
RelativeRateOfChangeStrategy, re-derived on the audit trail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["partition", "column", "check"]


def metric_anomalies(
    verdicts_audit: DataFrame,
    current_run_id: str,
    *,
    k: float = 3.0,
    min_abs: float = 0.0,
    min_rel: float = 0.0,
    min_history: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Gate the run ``current_run_id``'s metrics against every other
    run in ``verdicts_audit`` (the frame read back from
    ``{audit}/verdicts``; pre-filter it to control the history window,
    e.g. the last 30 days).

    Returns one row per (partition, column, check) of the current run:
    ``(partition, column, check, metric, history_median, history_mad,
    n_history, tolerance, passed)`` — ``history_*`` NULL and ``passed``
    true when fewer than ``min_history`` prior runs carry the key.

    Scale: aggregates only audit rows (|runs| x |keys|), shuffled on
    the verdict key — never the data table. Exact medians are fine at
    that cardinality; per-key history fits one row group.
    """
    cur = verdicts_audit.filter(F.col("run_id") == current_run_id).select(
        *_KEY, "metric"
    )
    hist = verdicts_audit.filter(F.col("run_id") != current_run_id).select(
        *_KEY, "metric"
    )
    med = hist.groupBy(*_KEY).agg(
        F.median("metric").alias("history_median"),
        F.count(F.lit(1)).alias("n_history"),
    )
    mad = (
        hist.join(med, _KEY)
        .groupBy(*_KEY)
        .agg(
            F.median(F.abs(F.col("metric") - F.col("history_median"))).alias(
                "history_mad"
            )
        )
    )
    tolerance = F.greatest(
        F.lit(float(k)) * F.col("history_mad"),
        F.lit(float(min_abs)),
        F.lit(float(min_rel)) * F.abs(F.col("history_median")),
    )
    insufficient = (
        F.col("history_median").isNull() | (F.col("n_history") < min_history)
    )
    return (
        cur.join(med, _KEY, "left")
        .join(mad, _KEY, "left")
        .select(
            *_KEY,
            "metric",
            F.round("history_median", round_to).alias("history_median"),
            F.round("history_mad", round_to).alias("history_mad"),
            F.coalesce(F.col("n_history"), F.lit(0)).alias("n_history"),
            F.round(tolerance, round_to).alias("tolerance"),
            F.when(insufficient, F.lit(True))
            .otherwise(
                # fail-closed: a NULL current metric (e.g. an empty
                # partition's try_divide stat) is unevaluable against
                # its history — flag it rather than emit passed=NULL,
                # which neither filter direction would catch
                F.coalesce(
                    F.abs(F.col("metric") - F.col("history_median"))
                    <= tolerance,
                    F.lit(False),
                )
            )
            .alias("passed"),
        )
        .orderBy(*_KEY)
    )


def last_k_runs(verdicts_audit: DataFrame, k: int) -> DataFrame:
    """Restrict an audit verdict frame to its k most recent run_ids
    (by max audit_ts per run) — the standard history window for
    ``metric_anomalies`` so a years-old regime change doesn't drag
    the median. Driver-collects only k+ run-id rows (runs, not
    verdicts — metadata-sized by construction)."""
    recent = [
        r["run_id"]
        for r in (
            verdicts_audit.groupBy("run_id")
            .agg(F.max("audit_ts").alias("_ts"))
            .orderBy(F.col("_ts").desc())
            .limit(k)
            .collect()
        )
    ]
    return verdicts_audit.filter(F.col("run_id").isin(recent))


def audit_anomalies(
    spark,
    audit_path: str,
    current_run_id: str,
    **kwargs,
) -> DataFrame:
    """Convenience wrapper: read ``{audit_path}/verdicts`` back and run
    ``metric_anomalies`` for ``current_run_id``; ``window_runs`` (if
    given) first trims history to the most recent k runs."""
    window_runs = kwargs.pop("window_runs", None)
    verdicts = spark.read.parquet(f"{audit_path}/verdicts")
    if window_runs is not None:
        verdicts = last_k_runs(verdicts, int(window_runs))
    return metric_anomalies(verdicts, current_run_id, **kwargs)
