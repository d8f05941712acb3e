"""Recall of the LSH-bucketed contract entries vs their exact
oracle-green twins, on the real testdata tables (sf0.001)."""

import os

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_cosine_neardup_lsh_recall_vs_exact(spark):
    qs = entry.queries()
    exact = {(r["id_a"], r["id_b"]) for r in qs["cosine_neardup"](spark, SF).collect()}
    approx = {(r["id_a"], r["id_b"]) for r in qs["cosine_neardup_lsh"](spark, SF).collect()}
    assert exact, "entry seeds +10000 copies; exact pair set must be non-empty"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall {recall} ({exact - approx} missed)"
    # candidates are verified with the exact cosine → no false accepts
    assert approx <= exact


def test_lsh_topk_contract_row(spark):
    """The oracle-checked lsh_topk contract: planted exact copies of
    the query vectors are strong brute-force neighbors (cosine 1.0)
    and sign-bit LSH must recall ALL of them (identical bits in every
    band) — strong_recall is structurally 1.0."""
    row = entry.queries()["lsh_topk"](spark, SF).collect()[0]
    assert row["n_queries"] == 5
    assert row["n_strong"] >= row["n_queries"]
    assert row["strong_recall"] == 1.0
    assert row["strong_recall_ge_0_9"] is True
