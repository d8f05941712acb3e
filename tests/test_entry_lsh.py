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
