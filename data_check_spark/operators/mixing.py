"""Training-mix construction: deterministic source reweighting with
fractional epochs.

A pretraining corpus is drawn from sources in TARGET proportions
(DoReMi/Pile-style static mixing weights), and data-constrained
recipes repeat scarce sources for multiple epochs (Muennighoff et
al., "Scaling Data-Constrained Language Models"). This module builds
that mix as pure DataFrame algebra:

* ``mix_plan(avail, weights, max_epochs)`` — driver math over
  |sources| numbers: the largest total T with T·w_s ≤ avail_s ·
  max_epochs for every source, i.e. the binding source caps the mix
  and every other source down/up-samples to proportion. Rates are
  quantized to 1/256 (the functions/splits bucket quantum): rate_s →
  (n_full full epochs, a 0-255 bucket bound for the fractional
  epoch), so the realized rate is the exact rational q/256 and every
  engine re-derives the same kept set.

* ``apply_mix(df, key_col, source_col, plan)`` — map-only expansion:
  each row explodes to n_full+1 epoch candidates (``sequence`` +
  ``explode``, no shuffle), the last kept iff the row's md5 bucket
  (key ':' salt — the splits convention, salt-disjoint from
  train/test splitting so mix and split decisions are independent)
  falls under the source's fractional bound. Deterministic,
  re-run/backfill stable, engine-portable — the DuckDB oracle
  (``source_mix``) re-derives every (row, epoch) decision.

Scale: the only aggregate is the |sources|-row availability count;
expansion is per-row JVM work with output size = Σ avail_s · rate_s
(the mix's actual size — nothing is shuffled to build it). Epochs
carry an ``epoch`` column so downstream packing/sharding can keep
copies apart; the kept set for a lower max_epochs nests inside a
higher one at equal weights (same buckets, same key), mirroring
stratified_sample's nesting guarantee.

No reference counterpart (the reference validates tables, it never
constructs corpora); lineage is the public mixing/repeating recipes
cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_check_spark.functions.splits import key_md5


def mix_plan(
    avail: dict[str, int],
    weights: dict[str, float],
    max_epochs: float = 1.0,
) -> dict[str, tuple[int, int]]:
    """{source: (n_full_epochs, fractional_bucket_bound_0_256)}.

    Weights are normalized over the sources present in ``weights``;
    sources absent from ``weights`` get no entry (dropped by
    apply_mix). Raises if a weighted source has no available rows.
    The realized total is sum(avail_s * q_s/256) — within one
    1/256-quantum per source of the ideal T·w_s."""
    if max_epochs < 1.0:
        raise ValueError(f"max_epochs must be >= 1.0, got {max_epochs}")
    negative = [s for s, w in weights.items() if w < 0]
    if negative:
        raise ValueError(f"negative weights for sources: {negative}")
    wsum = sum(weights.values())
    if not weights or wsum <= 0:
        raise ValueError("weights must be non-empty with positive sum")
    # zero-weight sources are a legal "document the exclusion" idiom:
    # their plan is (0, 0) regardless of availability, so only
    # positively-weighted sources need rows
    missing = [s for s, w in weights.items() if w > 0 and avail.get(s, 0) <= 0]
    if missing:
        raise ValueError(f"weighted sources with no available rows: {missing}")
    t = min(avail[s] * max_epochs / (w / wsum) for s, w in weights.items() if w > 0)
    plan: dict[str, tuple[int, int]] = {}
    for s, w in weights.items():
        if w <= 0:  # documented exclusion: emits nothing
            plan[s] = (0, 0)
            continue
        rate = t * (w / wsum) / avail[s]  # <= max_epochs by construction
        # HALF_UP (floor(x+0.5)), not Python's banker's round — an SQL
        # twin re-deriving the plan computes the identical q as long
        # as it mirrors this expression structure (the source_mix
        # oracle does)
        q = int(rate * 256 + 0.5)
        plan[s] = (q // 256, q % 256)
    return plan


def apply_mix(
    df: DataFrame,
    key_col: str,
    source_col: str,
    plan: dict[str, tuple[int, int]],
    salt: str = "dcs-mix",
) -> DataFrame:
    """Expand/filter ``df`` per ``plan``: output carries every input
    column plus ``epoch`` (0-based copy index). Map-only — explode to
    n_full+1 candidates, keep candidate c when c < n_full, and the
    fractional candidate c == n_full when the row's md5 bucket clears
    the source's bound. Sources absent from the plan emit nothing.
    Rejects inputs already carrying an ``epoch`` (or temporary)
    column — the output column would silently shadow it."""
    for c in ("epoch", "_nf", "_bd"):
        if c in df.columns:
            raise ValueError(
                f"input already has a {c!r} column — apply_mix emits "
                f"'epoch' (and uses _nf/_bd internally); rename or drop "
                f"it first (re-mixing a mixed corpus compounds rates: "
                f"drop the old epoch and re-plan from the raw sources)"
            )
    nf = F.lit(None).cast("int")
    bd = F.lit(None).cast("int")
    for s, (n_full, bound) in plan.items():
        cond = F.col(source_col) == s
        nf = F.when(cond, F.lit(n_full)).otherwise(nf)
        bd = F.when(cond, F.lit(bound)).otherwise(bd)
    bucket = F.conv(
        F.substring(key_md5(F.col(key_col), salt), 1, 2), 16, 10
    ).cast("int")
    return (
        df.withColumn("_nf", nf)
        .withColumn("_bd", bd)
        .filter(F.col("_nf").isNotNull())
        .withColumn("epoch", F.explode(F.expr("sequence(0, _nf)")))
        .filter((F.col("epoch") < F.col("_nf")) | (bucket < F.col("_bd")))
        .drop("_nf", "_bd")
    )


def source_mix(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
    max_epochs: float = 1.0,
    salt: str = "dcs-mix",
) -> DataFrame:
    """One-call mix: count availability per source (a |sources|-row
    driver readout — the one tiny collect, documented), solve the
    plan, apply it."""
    avail = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return apply_mix(
        df, key_col, source_col, mix_plan(avail, weights, max_epochs), salt
    )
