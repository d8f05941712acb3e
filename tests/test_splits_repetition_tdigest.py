"""Tests for the round-4 additions: hash_split (deterministic
train/val/test), repetition_metrics (Gopher-style boilerplate
filters), and the real t-digest sketch."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_check_spark.functions.splits import hash_split, split_summary, split_thresholds
from data_check_spark.functions.textstats import repetition_metrics
from data_check_spark.operators.sketch import (
    _merge_centroids,
    merge_tdigest,
    partition_tdigest,
    quantiles_via_tdigest,
)


# ---------------------------------------------------------------- splits
def test_split_thresholds_quantization():
    assert split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1}) == [
        ("train", "cd"),
        ("val", "e6"),
        ("test", "g"),
    ]
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.9, "b": 0.2})
    # a negative fraction passes the sum check but would corrupt the
    # bounds into non-monotonic order — rejected explicitly
    with pytest.raises(ValueError, match=">= 0"):
        split_thresholds({"a": 0.5, "b": -0.3, "c": 0.5})


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in hash_split(df, "k").collect()}
    b = {
        r["k"]: r["split"]
        for r in hash_split(df.repartition(7), "k").collect()
    }
    assert a == b  # pure function of the key — no partitioning dependence
    fracs = {s: sum(1 for v in a.values() if v == s) / 2000 for s in ("train", "val", "test")}
    assert abs(fracs["train"] - 205 / 256) < 0.03
    assert abs(fracs["val"] - 25 / 256) < 0.02
    assert abs(fracs["test"] - 26 / 256) < 0.02
    assert None not in a.values()  # fractions sum to 1 → every row labeled


def test_hash_split_salt_changes_assignment(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in hash_split(df, "k", salt="s1").collect()}
    b = {r["k"]: r["split"] for r in hash_split(df, "k", salt="s2").collect()}
    assert a != b


def test_split_summary_covers_all_rows(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    s = split_summary(df, "k", weight_col="w").collect()
    assert sum(r["n_rows"] for r in s) == 1000
    assert sum(r["weight_sum"] for r in s) == sum(2 * i for i in range(1000))


# ---------------------------------------------------------- repetition
def _rep_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return repetition_metrics(df, "text").collect()[0]


def test_repetition_all_unique(spark):
    r = _rep_one(spark, "a b c d e f")
    assert r["dup_2gram_frac"] == 0.0
    assert r["dup_3gram_frac"] == 0.0
    assert r["top_2gram_frac"] == pytest.approx(1 / 5, abs=1e-6)
    assert r["dup_line_frac"] == 0.0


def test_repetition_fully_repeated(spark):
    # "x y x y x y": 2-grams = [x y, y x, x y, y x, x y] → 2 distinct of 5
    r = _rep_one(spark, "x y x y x y")
    assert r["dup_2gram_frac"] == pytest.approx(1 - 2 / 5, abs=1e-6)
    assert r["top_2gram_frac"] == pytest.approx(3 / 5, abs=1e-6)


def test_repetition_duplicate_lines(spark):
    r = _rep_one(spark, "hello world\nhello world\nunique line")
    assert r["dup_line_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)


def test_repetition_edge_cases(spark):
    # fewer tokens than n → empty gram array → NULL fraction (0/0)
    r = _rep_one(spark, "single")
    assert r["dup_2gram_frac"] is None
    assert r["top_3gram_frac"] is None
    r = _rep_one(spark, "")
    assert r["dup_line_frac"] is None
    r = _rep_one(spark, None)
    assert all(
        r[c] is None
        for c in ("dup_line_frac", "dup_2gram_frac", "top_2gram_frac")
    )


def test_map_only_plans(spark):
    """repetition_metrics and hash_split are row-local: their physical
    plans must contain NO Exchange (shuffle) — the property that makes
    them free at 100 TB."""
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("a b c a b").alias("text")
    )
    for out in (repetition_metrics(df, "text"), hash_split(df, "doc_id")):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


# ------------------------------------------------------------------ IVF
def _clustered_vectors(rng, n, dim, n_clusters):
    centers = rng.standard_normal((n_clusters, dim)) * 3.0
    assign = rng.randint(0, n_clusters, n)
    return centers[assign] + rng.standard_normal((n, dim)) * 0.3


def test_ivf_topk_recall_vs_bruteforce(spark):
    from data_check_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.RandomState(9)
    x = _clustered_vectors(rng, 1200, 16, 8)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<float>",
    ).repartition(6)
    q = df.filter("vec_id < 10")
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, q, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(df, q, dim=16, k=5, n_centroids=16, n_probe=6).collect()
    }
    recall = len(ivf & bf) / len(bf)
    assert recall >= 0.8, recall  # clustered data: probed cells cover the cluster


def test_ivf_topk_partition_invariant(spark):
    """Centroids train on a TakeOrdered sample and assignment is a pure
    function of the vector, so results are identical at any
    parallelism."""
    from data_check_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(4)
    x = _clustered_vectors(rng, 400, 8, 4)
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    outs = []
    for parts in (2, 8):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).repartition(parts)
        q = df.filter("vec_id < 5")
        outs.append(
            [tuple(r) for r in ivf_topk(df, q, dim=8, k=3, n_centroids=8, n_probe=3).collect()]
        )
    assert outs[0] == outs[1]


def test_ivf_planted_copy_always_found(spark):
    from data_check_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(2)
    x = rng.standard_normal((300, 8))
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 5")
    aug = df.unionByName(q.selectExpr("vec_id + 1000 AS vec_id", "embedding"))
    top = ivf_topk(aug, q, dim=8, k=1, n_centroids=8, n_probe=1).collect()
    # the exact copy lands in the query's own top-1 probe cell
    assert {(r["query_id"], r["neighbor_id"]) for r in top} == {
        (i, i + 1000) for i in range(5)
    }


# ------------------------------------------------------------- t-digest
def test_merge_centroids_invariants():
    rng = np.random.RandomState(7)
    v = rng.lognormal(3.0, 1.0, 200_000)
    m, w = _merge_centroids(v, np.ones_like(v), delta=300.0)
    assert len(m) < 400  # ~2·delta bound
    assert w.sum() == pytest.approx(len(v))
    assert np.all(np.diff(m) >= 0)  # means sorted
    # weighted mean preserved exactly (merge is mean-preserving)
    assert float((m * w).sum()) == pytest.approx(float(v.sum()), rel=1e-9)


def test_tdigest_rank_error_bound(spark):
    rng = np.random.RandomState(11)
    v = rng.lognormal(3.0, 1.0, 50_000)
    df = spark.createDataFrame([(float(x),) for x in v], "x double").repartition(8)
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    est = {r["q"]: r["value"] for r in quantiles_via_tdigest(df, "x", qs).collect()}
    sv = np.sort(v)
    for q in qs:
        cdf = np.searchsorted(sv, est[q], side="right") / len(sv)
        assert abs(cdf - q) <= 0.01, (q, est[q], cdf)


def test_tdigest_merge_partition_count_insensitive(spark):
    """Estimates from 2 vs 16 partitions agree to the rank bound —
    the merge invariant, not bit-equality."""
    rng = np.random.RandomState(3)
    v = rng.normal(100.0, 15.0, 30_000)
    sv = np.sort(v)
    for parts in (2, 16):
        df = spark.createDataFrame([(float(x),) for x in v], "x double").repartition(parts)
        est = {r["q"]: r["value"] for r in quantiles_via_tdigest(df, "x", [0.5, 0.99]).collect()}
        for q in (0.5, 0.99):
            cdf = np.searchsorted(sv, est[q], side="right") / len(sv)
            assert abs(cdf - q) <= 0.01


def test_tdigest_extremes_and_empty(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    est = {r["q"]: r["value"] for r in quantiles_via_tdigest(df, "x", [0.0, 1.0]).collect()}
    assert est[0.0] == 1.0  # clamped to exact min
    assert est[1.0] == 3.0  # clamped to exact max
    empty = df.filter("x > 10")
    rows = quantiles_via_tdigest(empty, "x", [0.5]).collect()
    assert rows[0]["value"] is None


def test_ks_psi_from_tdigest(spark):
    """Digest-based KS tracks the exact empirical KS; PSI near zero
    on same-distribution, clearly positive on a shifted one."""
    from data_check_spark.operators.drift import ks_from_tdigest, psi_from_tdigest

    rng = np.random.RandomState(17)
    a = rng.normal(100.0, 15.0, 20_000)
    b = rng.normal(110.0, 15.0, 20_000)  # +10 shift
    same = rng.normal(100.0, 15.0, 20_000)
    mk = lambda v: spark.createDataFrame([(float(x),) for x in v], "x double").repartition(4)  # noqa: E731

    # exact two-sample KS for the shifted pair
    sa, sb = np.sort(a), np.sort(b)
    xs = np.union1d(sa, sb)
    exact_ks = float(
        np.max(
            np.abs(
                np.searchsorted(sa, xs, side="right") / len(sa)
                - np.searchsorted(sb, xs, side="right") / len(sb)
            )
        )
    )
    got = ks_from_tdigest(mk(a), mk(b), "x").collect()[0]["ks"]
    assert abs(got - exact_ks) < 0.02, (got, exact_ks)

    near = ks_from_tdigest(mk(a), mk(same), "x").collect()[0]["ks"]
    assert near < 0.03

    psi_shift = psi_from_tdigest(mk(a), mk(b), "x").collect()[0]["psi"]
    psi_same = psi_from_tdigest(mk(a), mk(same), "x").collect()[0]["psi"]
    assert psi_shift > 5 * max(psi_same, 0.001)


def test_tdigest_persist_and_merge_across_runs(spark, tmp_path):
    """The audit-table workflow: run 1 digests half the data and
    persists the centroid rows; run 2 digests the rest, merges with
    the stored digest, and reads quantiles over the UNION without
    rescanning run 1's data."""
    rng = np.random.RandomState(23)
    v = rng.gamma(4.0, 25.0, 40_000)
    df = spark.createDataFrame([(float(x),) for x in v], "x double")
    half1 = df.filter("x < 100"); half2 = df.filter("x >= 100")
    p = str(tmp_path / "digest_run1")
    merge_tdigest(partition_tdigest(half1, "x")).write.parquet(p)
    stored = spark.read.parquet(p)
    combined = merge_tdigest(stored.unionByName(partition_tdigest(half2, "x")))
    from data_check_spark.operators.sketch import tdigest_quantiles

    est = {r["q"]: r["value"] for r in tdigest_quantiles(combined, [0.1, 0.5, 0.9]).collect()}
    sv = np.sort(v)
    for q in (0.1, 0.5, 0.9):
        cdf = np.searchsorted(sv, est[q], side="right") / len(sv)
        assert abs(cdf - q) <= 0.015, (q, est[q], cdf)


def test_tdigest_tree_merge_matches_flat(spark):
    rng = np.random.RandomState(5)
    v = rng.uniform(0, 1000, 20_000)
    df = spark.createDataFrame([(float(x),) for x in v], "x double").repartition(8)
    parts = partition_tdigest(df, "x")
    flat = merge_tdigest(parts)
    tree = merge_tdigest(parts, fan_in=4)
    sv = np.sort(v)
    from data_check_spark.operators.sketch import tdigest_quantiles

    for digest in (flat, tree):
        est = {r["q"]: r["value"] for r in tdigest_quantiles(digest, [0.25, 0.75]).collect()}
        for q in (0.25, 0.75):
            cdf = np.searchsorted(sv, est[q], side="right") / len(sv)
            assert abs(cdf - q) <= 0.015


def test_ivf_hash_sampled_training(spark):
    """sample_mod training path (the 10^5-partition regime) still
    produces a working quantizer: planted copies always found."""
    from data_check_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(6)
    x = rng.standard_normal((600, 8))
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 4")
    aug = df.unionByName(q.selectExpr("vec_id + 5000 AS vec_id", "embedding"))
    top = ivf_topk(
        aug, q, dim=8, k=1, n_centroids=8, n_probe=1, sample_mod=2
    ).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in top} == {
        (i, i + 5000) for i in range(4)
    }


def test_ivf_auto_sample_mod_many_partitions(spark):
    """VERDICT r4 #1: on a many-partition frame the DEFAULT
    ('auto') training-sample path must select the hash filter, and
    the centroids must stay deterministic across partition layouts."""
    from data_check_spark.operators.similarity import (
        AUTO_HASH_SAMPLE_PARTS,
        _auto_sample_mod,
        kmeans_centroids,
    )

    rng = np.random.RandomState(8)
    x = rng.standard_normal((600, 8))
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def sel(parts):
        df = base.repartition(parts)
        return df.selectExpr("vec_id AS _id", "embedding AS _v").filter(
            "_v IS NOT NULL"
        )

    # small frame: auto keeps the TakeOrdered path (no extra job)
    assert _auto_sample_mod(sel(8), max_sample=50) is None
    # many partitions + enough rows: the hash path is selected
    many = AUTO_HASH_SAMPLE_PARTS + 16
    mod = _auto_sample_mod(sel(many), max_sample=50)
    assert mod is not None and mod >= 2  # 600 // (4*50) = 3
    # centroids identical across two different many-partition layouts
    cents = [
        kmeans_centroids(
            base.repartition(p), dim=8, n_centroids=8, max_sample=50,
            sample_mod="auto",
        )
        for p in (many, 3 * many)
    ]
    assert np.array_equal(cents[0], cents[1])
    # and auto == TakeOrdered on the small frame (same sample drawn)
    small_auto = kmeans_centroids(
        base.repartition(8), dim=8, n_centroids=8, max_sample=50, sample_mod="auto"
    )
    small_forced = kmeans_centroids(
        base.repartition(8), dim=8, n_centroids=8, max_sample=50, sample_mod=None
    )
    assert np.array_equal(small_auto, small_forced)


def test_ivf_topk_null_vectors_filtered(spark):
    """A NULL embedding must not fail the assign/probe UDF stages
    (ADVICE r4): NULL rows are dropped on both sides."""
    from data_check_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(12)
    x = rng.standard_normal((300, 8))
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    rows.append((9000, None))  # NULL embedding among the candidates
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 4 OR vec_id = 9000")  # NULL among queries too
    aug = df.unionByName(
        df.filter("vec_id < 4").selectExpr("vec_id + 5000 AS vec_id", "embedding")
    )
    top = ivf_topk(aug, q, dim=8, k=1, n_centroids=8, n_probe=1).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in top} == {
        (i, i + 5000) for i in range(4)
    }


def test_tdigest_auto_fan_in(spark, monkeypatch):
    """VERDICT r4 #2: fan_in='auto' derives the tree level from the
    partition count — 1 below the row cap, >1 above it, and the
    rank-error contract still holds through the extra level."""
    import data_check_spark.operators.sketch as sk

    rng = np.random.RandomState(19)
    v = rng.uniform(0, 1000, 20_000)
    df = spark.createDataFrame([(float(x),) for x in v], "x double").repartition(8)
    parts = partition_tdigest(df, "x")
    # default cap: 8 partitions x 601 rows ≈ 4.8k << 200k → single level
    assert sk._auto_fan_in(parts, 300.0) == 1
    # shrink the cap → a tree level kicks in
    monkeypatch.setattr(sk, "TDIGEST_MERGE_TASK_ROWS", 1_000)
    fan = sk._auto_fan_in(parts, 300.0)
    assert fan > 1  # ceil(8*601 / 1000) = 5
    est = {
        r["q"]: r["value"]
        for r in sk.tdigest_quantiles(
            merge_tdigest(parts, fan_in="auto"), [0.25, 0.75]
        ).collect()
    }
    sv = np.sort(v)
    for q in (0.25, 0.75):
        cdf = np.searchsorted(sv, est[q], side="right") / len(sv)
        assert abs(cdf - q) <= 0.015


# ---------------------------------------------------- stratified sampling
def _strat_df(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("g"),
    )


def test_stratified_sample_rates(spark):
    from data_check_spark.functions.splits import stratified_sample

    df = _strat_df(spark)
    out = stratified_sample(df, "k", "g", {"s0": 0.5, "s1": 0.25}, default_rate=0.0)
    per = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    # 500 rows per stratum; md5 buckets are uniform: expect ~250/~125,
    # zero for unlisted strata
    assert set(per) <= {"s0", "s1"}
    assert abs(per["s0"] - 250) < 60 and abs(per["s1"] - 125) < 45


def test_stratified_sample_nested(spark):
    """A row kept at rate r stays kept at any higher rate — the
    documented nested-sample guarantee (same bucket, same key)."""
    from data_check_spark.functions.splits import stratified_sample

    df = _strat_df(spark)
    lo = {r["k"] for r in stratified_sample(df, "k", "g", {"s0": 0.125}).select("k").collect()}
    hi = {r["k"] for r in stratified_sample(df, "k", "g", {"s0": 0.5}).select("k").collect()}
    assert lo <= hi and len(lo) < len(hi)


def test_stratified_sample_default_and_full(spark):
    from data_check_spark.functions.splits import stratified_sample

    df = _strat_df(spark, 400)
    # rate >= 1.0 keeps the whole stratum; default applies to the rest
    out = stratified_sample(df, "k", "g", {"s0": 1.0}, default_rate=1.0)
    assert out.count() == 400
    none = stratified_sample(df, "k", "g", {"s0": 0.0}, default_rate=0.0)
    assert none.count() == 0
    with pytest.raises(ValueError, match="negative"):
        stratified_sample(df, "k", "g", {"s0": -0.1})


def test_stratified_sample_partition_invariant(spark):
    from data_check_spark.functions.splits import stratified_sample

    df = _strat_df(spark)
    a = sorted(r["k"] for r in stratified_sample(df.repartition(1), "k", "g", {"s0": 0.3, "s2": 0.7}).select("k").collect())
    b = sorted(r["k"] for r in stratified_sample(df.repartition(19), "k", "g", {"s0": 0.3, "s2": 0.7}).select("k").collect())
    assert a == b


def test_temperature_rates_shapes():
    from data_check_spark.functions.splits import temperature_rates

    counts = {"en": 80000, "fr": 15000, "zh": 5000}
    # alpha=1: natural mix -> every stratum keeps the same fraction
    r1 = temperature_rates(counts, 1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())
    # alpha=0: equal-size target -> rates inversely proportional to counts
    r0 = temperature_rates(counts, 0.0)
    assert r0["zh"] == pytest.approx(1.0)
    assert r0["en"] == pytest.approx(5000 / 80000)
    # alpha=0.5 lies between; smallest stratum always keeps the most
    rh = temperature_rates(counts, 0.5)
    assert rh["zh"] == pytest.approx(1.0) and rh["en"] < rh["fr"] < 1.0
    # budget scales everything
    rb = temperature_rates(counts, 0.5, budget=0.5)
    assert all(rb[s] == pytest.approx(0.5 * rh[s]) for s in counts)
    with pytest.raises(ValueError, match="positive"):
        temperature_rates({"a": 0}, 1.0)
    with pytest.raises(ValueError, match="budget"):
        temperature_rates(counts, 1.0, budget=1.5)


def test_temperature_mix_realized(spark):
    """temperature_rates -> stratified_sample realizes the alpha mix:
    sampled shares track count^alpha shares (within 1/256 quantization
    + hash noise)."""
    from data_check_spark.functions.splits import (
        stratified_sample,
        temperature_rates,
    )

    sizes = {"s0": 6000, "s1": 1500, "s2": 500}
    rows, k = [], 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((k, g))
            k += 1
    df = spark.createDataFrame(rows, "k bigint, g string")
    rates = temperature_rates(sizes, 0.5)
    got = {
        r["g"]: r["n"]
        for r in stratified_sample(df, "k", "g", rates)
        .groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    w = {g: n**0.5 for g, n in sizes.items()}
    tw = sum(w.values())
    total = sum(got.values())
    for g in sizes:
        assert abs(got[g] / total - w[g] / tw) < 0.05, (g, got)


# ------------------------------------------------------------ cap_per_key
def _single_window_cap(spark, df, key_col, cap, id_col, salt="dcs-cap"):
    """Reference: the naive one-window formulation the two-phase plan
    must equal exactly."""
    from pyspark.sql import Window

    ordk = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)).cast("binary")
    )
    w = Window.partitionBy(key_col).orderBy(ordk, F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= cap
    ).drop("_rn")


def test_cap_per_key_equals_single_window(spark):
    from data_check_spark.functions.splits import cap_per_key

    rows = [(f"dom{i % 7}", i) for i in range(500)] + [("hot", 1000 + i) for i in range(200)]
    df = spark.createDataFrame(rows, "domain string, doc_id long")
    got = sorted(map(tuple, cap_per_key(df, "domain", 11, "doc_id").collect()))
    want = sorted(
        map(tuple, _single_window_cap(spark, df, "domain", 11, "doc_id").collect())
    )
    assert got == want
    # exactly cap rows per key when the key has >= cap rows
    from collections import Counter

    per = Counter(d for d, _ in got)
    assert per["hot"] == 11 and all(v == 11 for v in per.values())


def test_cap_per_key_determinism_and_small_groups(spark):
    from data_check_spark.functions.splits import cap_per_key

    rows = [("a", 1), ("a", 2), ("b", 3)]
    df = spark.createDataFrame(rows, "domain string, doc_id long")
    got = sorted(map(tuple, cap_per_key(df, "domain", 5, "doc_id").collect()))
    assert got == sorted(rows)  # cap above group size keeps everything
    # partition-count invariance: same kept set at any parallelism
    a = sorted(map(tuple, cap_per_key(df.repartition(1), "domain", 1, "doc_id").collect()))
    b = sorted(map(tuple, cap_per_key(df.repartition(7), "domain", 1, "doc_id").collect()))
    assert a == b and len(a) == 2
    with pytest.raises(ValueError):
        cap_per_key(df, "domain", 0, "doc_id")


def test_cap_per_key_hot_key_spreads_phase1(spark):
    """Plan shape: phase 1 must partition by (key, bucket) — the
    hot-domain shuffle key — not by key alone."""
    from data_check_spark.functions.splits import cap_per_key

    df = spark.createDataFrame([("hot", i) for i in range(50)], "domain string, doc_id long")
    plan = cap_per_key(df, "domain", 3, "doc_id")._jdf.queryExecution().optimizedPlan().toString()
    assert "substring(_ordk" in plan, plan


def _budget_reference(rows, budget, salt="dcs-budget"):
    """Brute-force greedy cut in md5(id:salt) order, pure python."""
    import hashlib

    ordered = sorted(
        rows, key=lambda r: (hashlib.md5(f"{r[0]}:{salt}".encode()).hexdigest(), r[0])
    )
    kept, cum = set(), 0
    for rid, w in ordered:
        if cum + w <= budget:
            kept.add(rid)
            cum += w
        else:
            break
    return kept


def test_budget_cut_matches_bruteforce(spark):
    from data_check_spark.functions.splits import budget_cut

    rows = [(i, (i * 7919) % 50 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    for budget in (0, 37, 500, 2000, 10**9):
        got = {
            r["doc_id"]
            for r in budget_cut(df, budget, F.col("w"), "doc_id").collect()
        }
        assert got == _budget_reference(rows, budget), budget


def test_budget_cut_prefix_len_invariant_and_nesting(spark):
    from data_check_spark.functions.splits import budget_cut

    rows = [(i, (i * 31) % 20 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    k1 = {r["doc_id"] for r in budget_cut(df, 800, F.col("w"), "doc_id", prefix_len=1).collect()}
    k2 = {r["doc_id"] for r in budget_cut(df, 800, F.col("w"), "doc_id", prefix_len=2).collect()}
    k3 = {r["doc_id"] for r in budget_cut(df, 800, F.col("w"), "doc_id", prefix_len=3).collect()}
    assert k1 == k2 == k3
    # smaller budgets nest inside larger ones
    small = {r["doc_id"] for r in budget_cut(df, 300, F.col("w"), "doc_id").collect()}
    assert small <= k2


def test_budget_cut_null_weight_counts_zero(spark):
    from data_check_spark.functions.splits import budget_cut

    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, None)], "doc_id long, w long"
    )
    got = {r["doc_id"] for r in budget_cut(df, 5, F.col("w"), "doc_id").collect()}
    # every row fits: NULLs weigh nothing, the one real weight is 5
    assert got == {1, 2, 3}
    import pytest as _p

    with _p.raises(ValueError):
        budget_cut(df, -1, F.col("w"), "doc_id")


def test_ivf_frozen_centroids_roundtrip(spark, tmp_path):
    """The IVF freeze lifecycle: train once, persist the quantizer as
    parquet (centroids_to_df), reload (centroids_from_df), and serve
    ivf_topk from the stored index — results identical to the
    self-trained run (training is deterministic, so frozen == fresh),
    with NO retraining job. A malformed stored frame is rejected."""
    import pytest as _pytest

    from data_check_spark.operators.similarity import (
        centroids_from_df,
        centroids_to_df,
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.RandomState(11)
    x = _clustered_vectors(rng, 600, 8, 6)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    q = df.filter("vec_id < 6")

    cents = kmeans_centroids(df, dim=8, n_centroids=8)
    path = str(tmp_path / "ivf_index")
    centroids_to_df(spark, cents).write.parquet(path)
    loaded = centroids_from_df(spark.read.parquet(path))
    assert np.allclose(loaded, cents)

    fresh = [tuple(r) for r in ivf_topk(df, q, dim=8, k=3, n_centroids=8, n_probe=3).collect()]
    frozen = [
        tuple(r)
        for r in ivf_topk(df, q, dim=8, k=3, n_probe=3, centroids=loaded).collect()
    ]
    assert fresh == frozen and len(frozen) > 0

    bad = centroids_to_df(spark, cents).filter("cell <> 3")
    with _pytest.raises(ValueError, match="0..n-1"):
        centroids_from_df(bad)
