"""operators/mixing: training-mix construction — plan math, exact
agreement with a pure-Python md5 recomputation of every (row, epoch)
decision, partitioning independence, epoch nesting, and the error
contracts."""

import hashlib

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.mixing import apply_mix, mix_plan, source_mix


def _bucket(key, salt="dcs-mix"):
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:2], 16)


def _py_mix(rows, plan, salt="dcs-mix"):
    """{(doc_id, epoch)} the mix should keep."""
    out = set()
    for doc_id, source in rows:
        if source not in plan:
            continue
        nf, bd = plan[source]
        for c in range(nf + 1):
            if c < nf or _bucket(doc_id, salt) < bd:
                out.add((doc_id, c))
    return out


def _docs(spark, n=300, n_src=3, parts=4):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % n_src)).alias("source"),
        )
        .repartition(parts)
    )


def test_mix_plan_math():
    plan = mix_plan(
        {"src0": 100, "src1": 100, "src2": 100},
        {"src0": 5, "src1": 3, "src2": 2},
        max_epochs=3.0,
    )
    # binding source src0 runs exactly 3 epochs; 1.8 -> 461/256, 1.2 -> 307/256
    assert plan == {"src0": (3, 0), "src1": (1, 205), "src2": (1, 51)}
    # pure downsampling: rate caps at 1.0 for the binding source
    plan1 = mix_plan({"a": 100, "b": 300}, {"a": 1, "b": 1}, max_epochs=1.0)
    assert plan1["a"] == (1, 0)  # 100 of 100
    assert plan1["b"] == (0, 85)  # 100/300 -> 85/256


def test_mix_plan_errors():
    with pytest.raises(ValueError, match="no available rows"):
        mix_plan({"a": 10}, {"a": 1, "ghost": 1})
    with pytest.raises(ValueError, match="max_epochs"):
        mix_plan({"a": 10}, {"a": 1}, max_epochs=0.5)
    with pytest.raises(ValueError, match="weights"):
        mix_plan({"a": 10}, {})
    # negative weights rejected outright (a negative rate would emit
    # epoch -1 rows through sequence(0, -1))
    with pytest.raises(ValueError, match="negative weights"):
        mix_plan({"a": 100, "b": 100}, {"a": 1.0, "b": -0.5})
    # weight 0 documents an exclusion: legal even with no rows, plan
    # emits nothing for it
    plan = mix_plan({"a": 10}, {"a": 1, "excluded": 0})
    assert plan["excluded"] == (0, 0)


def test_apply_mix_rejects_epoch_collision(spark):
    df = spark.createDataFrame(
        [(1, "src0", 0)], "doc_id bigint, source string, epoch int"
    )
    with pytest.raises(ValueError, match="'epoch' column"):
        apply_mix(df, "doc_id", "source", {"src0": (1, 0)})


def test_apply_matches_python_and_parallelism(spark):
    rows = [(i, f"src{i % 3}") for i in range(300)]
    plan = mix_plan(
        {"src0": 100, "src1": 100, "src2": 100},
        {"src0": 5, "src1": 3, "src2": 2},
        max_epochs=3.0,
    )
    want = _py_mix(rows, plan)
    for parts in (1, 16):
        got = {
            (r["doc_id"], r["epoch"])
            for r in apply_mix(
                _docs(spark, parts=parts), "doc_id", "source", plan
            ).collect()
        }
        assert got == want
    # unweighted source emits nothing; weighted proportions realized
    assert not any(s == "src3" for _, s in rows if False)
    per_src = {}
    for d, c in want:
        per_src[d % 3] = per_src.get(d % 3, 0) + 1
    assert per_src[0] == 300  # 3 epochs x 100
    assert 150 < per_src[1] < 210 and 100 < per_src[2] < 140  # ~1.8x, ~1.2x


def test_source_mix_end_to_end(spark):
    out = source_mix(
        _docs(spark), "doc_id", "source", {"src0": 5, "src1": 3, "src2": 2},
        max_epochs=3.0,
    )
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts["src0"] == 300
    assert set(counts) == {"src0", "src1", "src2"}


def test_epoch_nesting(spark):
    """At equal weights, the kept (row, epoch) set for a lower
    max_epochs nests inside a higher one — ablation subsets need no
    extra pass."""
    avail = {"src0": 100, "src1": 100, "src2": 100}
    w = {"src0": 5, "src1": 3, "src2": 2}
    rows = [(i, f"src{i % 3}") for i in range(300)]
    small = _py_mix(rows, mix_plan(avail, w, max_epochs=2.0))
    big = _py_mix(rows, mix_plan(avail, w, max_epochs=3.0))
    assert small < big
