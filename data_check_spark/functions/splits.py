"""Deterministic dataset splitting for training pipelines.

A train/val/test split at 100 TB must be (a) a pure function of the
row key — re-runs, backfills and late-arriving shards land in the
same split with no coordination, (b) engine-portable — the labels a
Spark job assigns must be reproducible by any other engine auditing
the split, and (c) shuffle-free — assignment is a row-local
expression, never a repartition.

``hash_split`` therefore buckets md5(key || ':' || salt) by its first
two hex characters (256 lexicographic buckets): md5 is bit-identical
everywhere, and comparing hex substrings avoids any hex→int
conversion quirk between engines. Fractions are quantized to 1/256
(~0.4% granularity) — documented, deterministic, and exactly
reproducible in ANSI SQL:

    CASE WHEN substr(md5(key || ':' || salt), 1, 2) < '<hex(t1)>' ...

Not random-per-run by design: ``randomSplit`` re-rolls on every
execution and cannot be audited after the fact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_md5(key: Column, salt: str) -> Column:
    """THE engine-portable key-hashing convention every deterministic
    row decision derives from — splits, stratified sampling, training
    mix (operators/mixing), shard export (operators/export):
    ``md5(key ':' salt)`` over the binary-cast string concat. DuckDB
    twin: ``md5(CAST(k AS VARCHAR) || ':salt')``. One definition so
    the convention the oracles re-derive cannot drift per operator."""
    return F.md5(F.concat(key.cast("string"), F.lit(":" + salt)).cast("binary"))


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """[(label, upper-bound 2-hex-char string)] with cumulative
    quantized bounds; last label absorbs the remainder."""
    if not fractions or sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("fractions must be non-empty and sum to <= 1.0")
    if any(f < 0 for f in fractions.values()):
        # a negative fraction passes the sum check but produces
        # non-monotonic bounds — the nested whens then silently
        # mislabel rows instead of splitting as declared
        raise ValueError("fractions must be >= 0")
    out: list[tuple[str, str]] = []
    cum = 0.0
    for label, frac in fractions.items():
        cum += frac
        bound = min(256, round(cum * 256))
        # bound 256 must sort AFTER every hex pair; '100' does not
        # ('ff' < '100' is lexicographically FALSE) — 'g' does.
        out.append((label, "g" if bound >= 256 else format(bound, "02x")))
    return out


def split_label(key: Column, fractions: dict[str, float], salt: str = "dcs") -> Column:
    """Split-label column from a row key: md5-bucketed, quantized to
    1/256. Rows past the last cumulative bound get NULL (holdout) —
    with fractions summing to 1.0 every row is labeled."""
    bucket = F.substring(key_md5(key, salt), 1, 2)
    expr = F.lit(None).cast("string")
    for label, bound in reversed(split_thresholds(fractions)):
        expr = F.when(bucket < F.lit(bound), F.lit(label)).otherwise(expr)
    return expr


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "dcs",
) -> DataFrame:
    """Add a ``split`` column (default 80/10/10 train/val/test)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn("split", split_label(F.col(key_col), fractions, salt))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    salt: str = "dcs-strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5
    bucket (same 256-bucket scheme as ``split_label``) falls under its
    stratum's quantized rate. Shuffle-free and re-run/backfill stable
    like ``hash_split`` — the training-mix use case ("50% of en, 25%
    of fr, drop the rest") needs sampling decisions that any engine
    can re-derive row-by-row, which ``df.sample`` (per-run RNG) cannot
    give. Strata absent from ``rates`` get ``default_rate``.

    Rates quantize to 1/256 like split fractions; a rate >= 1.0 keeps
    the whole stratum. Because every stratum reads the SAME bucket of
    the SAME key, a row kept at rate r stays kept at any rate' > r —
    nested samples for curriculum/ablation mixes are free."""
    if not rates:
        raise ValueError("rates must be non-empty")
    for s, r in {**rates, "<default>": default_rate}.items():
        if r < 0:
            raise ValueError(f"negative rate for stratum {s!r}")
    bucket = F.substring(key_md5(F.col(key_col), salt), 1, 2)

    def bound(rate: float) -> str:
        b = min(256, round(rate * 256))
        return "g" if b >= 256 else format(b, "02x")

    keep = bucket < F.lit(bound(default_rate))
    for stratum, rate in rates.items():
        keep = F.when(
            F.col(strata_col) == F.lit(stratum), bucket < F.lit(bound(rate))
        ).otherwise(keep)
    return df.filter(keep)


def temperature_rates(
    counts: dict[str, int], alpha: float, budget: float | None = None
) -> dict[str, float]:
    """Per-stratum keep-rates so a ``stratified_sample`` realizes a
    temperature-``alpha`` mix: sampled share of stratum s ∝
    ``count_s**alpha`` (the multilingual upsampling scheme of
    XLM-R/mBERT-style pipelines — alpha<1 upsamples low-resource
    strata RELATIVE to the rest by downsampling the head less than
    proportionally... i.e. the head is cut hardest). ``alpha=1``
    keeps the natural mix (all rates equal), ``alpha=0`` targets
    equal-sized strata.

    Rates are scaled so the largest is 1.0 (keep everything from the
    most-downweighted stratum — the largest possible sample with the
    requested shape); pass ``budget`` in (0, 1] to scale all rates
    down further (e.g. 0.1 → a 10%-of-maximum mix). Rates are exact
    here; ``stratified_sample`` quantizes them to 1/256 on use."""
    if not counts or any(c <= 0 for c in counts.values()):
        raise ValueError("counts must be non-empty and positive")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if budget is not None and not (0 < budget <= 1):
        raise ValueError("budget must be in (0, 1]")
    weights = {s: c**alpha for s, c in counts.items()}
    tot_w = sum(weights.values())
    # unscaled rate ∝ target share / available count
    raw = {s: (weights[s] / tot_w) / counts[s] for s in counts}
    scale = (budget or 1.0) / max(raw.values())
    return {s: r * scale for s, r in raw.items()}


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    id_col: str,
    salt: str = "dcs-cap",
) -> DataFrame:
    """Deterministic per-key document quota — the web-corpus curation
    move against SEO farms and aggregator domains that flood a crawl:
    keep at most ``cap`` rows per ``key_col`` (domain, site, source),
    chosen as the ``cap`` smallest md5(id:salt) hex digests (ties by
    id). Like every sampler in this module the selection is a pure
    function of the row id — re-runs, backfills and late shards keep
    the SAME representatives with no coordination, and any engine can
    re-derive the kept set row-by-row (``row_number() OVER ... ORDER
    BY md5(...)`` in ANSI SQL — the DuckDB oracle does exactly that).

    Scale shape: a single window over a 10^8-row hot domain would pin
    one task, so selection is two-phase salted top-K: phase 1 windows
    over (key, md5-first-byte bucket) — a hot key spreads across 256
    tasks and each bucket keeps at most ``cap`` — phase 2 re-windows
    the ≤ 256·cap survivors per key. The global top-``cap`` per key is
    a subset of the per-bucket top-``cap`` union (each global pick is
    within its own bucket's top-``cap``), so the two-phase result is
    exactly the single-window result at any parallelism.

    ``id_col`` must be non-null (it is the selection key; NULL
    ordering differs between engines). NULL ``key_col`` forms its own
    group like any SQL window partition."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    ordk = key_md5(F.col(id_col), salt)
    with_ord = df.withColumn("_ordk", ordk)
    phase1 = Window.partitionBy(
        F.col(key_col), F.substring("_ordk", 1, 2)
    ).orderBy(F.col("_ordk"), F.col(id_col))
    phase2 = Window.partitionBy(F.col(key_col)).orderBy(
        F.col("_ordk"), F.col(id_col)
    )
    return (
        with_ord.withColumn("_rn1", F.row_number().over(phase1))
        .filter(F.col("_rn1") <= cap)
        .withColumn("_rn2", F.row_number().over(phase2))
        .filter(F.col("_rn2") <= cap)
        .drop("_ordk", "_rn1", "_rn2")
    )


def budget_cut(
    df: DataFrame,
    budget: int,
    weight: Column,
    id_col: str,
    salt: str = "dcs-budget",
    prefix_len: int = 2,
) -> DataFrame:
    """Deterministic corpus cut to a global WEIGHT budget — "give me
    ~N tokens of this corpus": rows are taken in md5(id:salt) hex
    order (ties by id) while the running weight total stays <= budget.
    Like every sampler in this module the kept set is a pure function
    of the row ids and weights — re-runs, backfills and late shards
    agree with no coordination, smaller budgets nest inside larger
    ones (same order, shorter prefix), and any engine re-derives the
    set with one ANSI window (``sum(w) OVER (ORDER BY md5(...), id)``
    — the DuckDB oracle does exactly that). Weights must be
    non-negative (token counts, byte sizes); NULL weight counts as 0.

    Scale shape: a single global running-sum window would pin one
    task, so the cut is two-phase: per-bucket weight sums over the
    md5 prefix (16^prefix_len buckets; hex order == global order
    because the prefix dominates the string compare) are prefix-summed
    on the driver — a 256-row readout at the default, 65,536 at
    prefix_len=4 for the 10^12-row regime — fully-under-budget
    buckets are kept whole with NO window at all, and only the ONE
    boundary bucket (~corpus/16^prefix_len rows) pays a running-sum
    window. Everything else is a map-side filter on the hex prefix.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if prefix_len < 1:
        raise ValueError(f"prefix_len must be >= 1, got {prefix_len}")
    from pyspark.sql import Window

    ordk = key_md5(F.col(id_col), salt)
    d = (
        df.withColumn("_ordk", ordk)
        .withColumn("_w", F.coalesce(weight.cast("long"), F.lit(0)))
        .withColumn("_b", F.substring("_ordk", 1, prefix_len))
    )
    # bounded driver readout: one (bucket, sum) row per hex prefix
    sums = {r["_b"]: r["s"] for r in d.groupBy("_b").agg(F.sum("_w").alias("s")).collect()}
    base = 0
    full: list[str] = []
    boundary: str | None = None
    for b in sorted(sums):
        if base + sums[b] <= budget:
            full.append(b)
            base += sums[b]
        else:
            boundary = b
            break
    parts = []
    if full:
        parts.append(d.filter(F.col("_b").isin(full)))
    if boundary is not None:
        win = Window.orderBy(F.col("_ordk"), F.col(id_col)).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        parts.append(
            d.filter(F.col("_b") == boundary)
            .withColumn("_cum", F.sum("_w").over(win) + F.lit(base))
            .filter(F.col("_cum") <= budget)
            .drop("_cum")
        )
    if not parts:
        return df.filter(F.lit(False))
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.drop("_ordk", "_w", "_b")


def split_summary(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    fractions: dict[str, float] | None = None,
    salt: str = "dcs",
) -> DataFrame:
    """Audit frame: one row per split with row count (and optional
    weight sum) — the readout a pipeline gate checks against the
    requested fractions."""
    lab = hash_split(df, key_col, fractions, salt)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("weight_sum"))
    return lab.groupBy("split").agg(*aggs).orderBy("split")
