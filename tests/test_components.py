import random

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.components import (
    connected_components,
    duplicate_clusters,
)


def _uf_components(edges):
    """Reference union-find: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, **kw).collect()
    return {r["id"]: r["component"] for r in out}


def test_cc_two_clusters(spark):
    got = _run(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_chain_converges_in_log_rounds(spark):
    # a 64-node path has diameter 63; naive min-propagation needs ~63
    # rounds, large-star/small-star needs O(log n) — max_iter=10 only
    # passes if the doubling behaviour is real
    edges = [(i, i + 1) for i in range(64)]
    got = _run(spark, edges, max_iter=10)
    assert got == {i: 0 for i in range(65)}


def test_cc_self_loops_and_duplicates_ignored(spark):
    got = _run(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_cc_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_cc_nulls_dropped(spark):
    got = _run(spark, [(1, None), (None, 7), (1, 2)])
    assert got == {1: 1, 2: 1}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_matches_union_find_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n, m = 200, 160  # sparse: many non-trivial components
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _uf_components(edges)


def test_duplicate_clusters_exemplar_and_sizes(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    rows = {r["id"]: r for r in duplicate_clusters(df).collect()}
    assert rows[1]["is_exemplar"] and rows[1]["cluster_size"] == 3
    assert not rows[3]["is_exemplar"] and rows[3]["component"] == 1
    assert rows[10]["is_exemplar"] and rows[10]["cluster_size"] == 2
    assert not rows[11]["is_exemplar"]


def test_cc_custom_columns(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    got = connected_components(df, src="a", dst="b").collect()
    assert {(r["id"], r["component"]) for r in got} == {(1, 1), (2, 1)}


def test_star_phase_plans_partial_agg_no_cartesian(spark):
    """Each star phase must be a map-side-combined min agg + hash join
    on node id: no adjacency collect_list, no cartesian/nested-loop."""
    from data_check_spark.operators.components import _large_star, _small_star

    e = spark.createDataFrame(
        [(i + 1, i) for i in range(50)], "u long, v long"
    )
    for phase in (_large_star, _small_star):
        out = phase(e)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "partial_min" in plan, plan
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
        assert "collect_list" not in plan, plan


def test_update_clusters_equals_full_recompute_merging_old_clusters(spark):
    # stored: {1,2,3} and {10,11}; new pair (3,10) merges them, (20,21) is new
    stored = connected_components(
        spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    )
    new = spark.createDataFrame([(3, 10), (20, 21)], "id_a long, id_b long")
    from data_check_spark.operators.components import update_clusters
    got = {r["id"]: r["component"] for r in update_clusters(stored, new).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20, 21: 20}


@pytest.mark.parametrize("seed", [7, 8])
def test_update_clusters_matches_full_on_random_split(spark, seed):
    from data_check_spark.operators.components import update_clusters

    rng = random.Random(seed)
    n = 150
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    cut = len(edges) // 2
    old, new = edges[:cut], edges[cut:]
    stored = connected_components(
        spark.createDataFrame(old, "id_a long, id_b long")
    )
    upd = update_clusters(
        stored, spark.createDataFrame(new, "id_a long, id_b long")
    )
    full = _run(spark, edges)
    got = {r["id"]: r["component"] for r in upd.collect()}
    # the update sees every node of old∪new; full CC agrees on all
    assert got == full


def test_chain_mode_clusters_equal_all_pairs_clusters(spark):
    """pair_mode='chain' emits a spanning subset of the all-pairs
    list, but cluster labels must come out identical on genuinely
    similar groups (the property NearDupCheck relies on)."""
    from data_check_spark.operators.dedup import minhash_lsh_pairs
    from data_check_spark.sources.synth import synth_pages

    df = synth_pages(spark, 400, 2)
    kw = dict(text_col="text", id_col="url", jaccard_threshold=0.9)
    all_p = minhash_lsh_pairs(df, **kw)
    chain_p = minhash_lsh_pairs(df, pair_mode="chain", **kw)
    cc_all = {r["id"]: r["component"]
              for r in connected_components(all_p).collect()}
    cc_chain = {r["id"]: r["component"]
                for r in connected_components(chain_p).collect()}
    assert cc_chain == cc_all


def test_strip_duplicates_keeps_exemplars_and_unclustered(spark):
    from data_check_spark.operators.components import strip_duplicates

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    corpus = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 10, 11, 99)], "doc_id long, text string"
    )
    kept = strip_duplicates(corpus, duplicate_clusters(pairs), "doc_id")
    assert {r["doc_id"] for r in kept.collect()} == {1, 10, 99}
    # schema passes through untouched
    assert kept.columns == ["doc_id", "text"]


def test_strip_duplicates_pure_function_of_pairs(spark):
    """Kept set must not depend on pair orientation or duplication."""
    from data_check_spark.operators.components import strip_duplicates

    corpus = spark.createDataFrame(
        [(i, "x") for i in range(6)], "doc_id long, text string"
    )
    a = spark.createDataFrame([(4, 2), (2, 0)], "id_a long, id_b long")
    b = spark.createDataFrame(
        [(0, 2), (2, 4), (4, 2), (2, 0)], "id_a long, id_b long"
    )
    got_a = {
        r["doc_id"]
        for r in strip_duplicates(corpus, duplicate_clusters(a)).collect()
    }
    got_b = {
        r["doc_id"]
        for r in strip_duplicates(corpus, duplicate_clusters(b)).collect()
    }
    assert got_a == got_b == {0, 1, 3, 5}


def test_strip_duplicates_broadcasts_small_drop_list(spark):
    """Under the size cap the anti-join must be a broadcast hash join
    (corpus side never exchanged), so text never shuffles."""
    from data_check_spark.operators.components import strip_duplicates

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    corpus = spark.range(100).selectExpr(
        "id as doc_id", "repeat('x', 50) as text"
    )
    out = strip_duplicates(corpus, duplicate_clusters(pairs), "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    anti_head = plan.split("LeftAnti")[0] + "LeftAnti"
    assert "BroadcastHashJoin" in anti_head
    # the corpus (probe) side sits directly under the anti-join with
    # no Exchange between them
    probe = plan.split("LeftAnti")[1].split("BroadcastExchange")[0]
    assert "Exchange" not in probe
