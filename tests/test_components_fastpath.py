"""connected_components' small-graph driver fast path must be
indistinguishable from the distributed star-contraction loop: same
(id, min-id component) labels on arbitrary graphs, and the cap must
route correctly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.components import (
    _driver_components,
    connected_components,
)


@pytest.fixture(scope="module")
def spark():
    from data_check_spark.session import get_spark

    s = get_spark("test-cc-fast", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _labels(df):
    return sorted((r["id"], r["component"]) for r in df.collect())


def test_fast_path_equals_distributed_loop(spark):
    """Random graph, both code paths (cap forces the distributed loop
    on one side), identical labellings."""
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(300)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = connected_components(pairs)  # default cap: fast path
    slow = connected_components(pairs, driver_max_edges=0)  # force loop
    assert _labels(fast) == _labels(slow)


def test_fast_path_min_id_labels(spark):
    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21), (7, 7)], "id_a long, id_b long"
    )
    out = _labels(connected_components(pairs))
    # self-pair (7,7) contributes nothing; chains label to their min
    assert out == [(3, 3), (5, 3), (9, 3), (20, 20), (21, 20)]


def test_driver_union_find_string_ids():
    lab = dict(_driver_components([("b", "c"), ("c", "a"), ("x", "y")]))
    assert lab == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_fast_path_output_type_matches_input(spark):
    pairs = spark.createDataFrame([("u1", "u2")], "id_a string, id_b string")
    out = connected_components(pairs)
    kinds = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert kinds == {"id": "string", "component": "string"}
