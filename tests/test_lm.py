"""operators/lm: CCNet-style bigram-LM scoring — exact agreement with
a pure-Python recomputation (counts, add-one smoothing, integer
HALF_UP quantization), the cross-trained OOV path, the float
perplexity identity, and the short-doc exclusion contract."""

import collections
import math

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.lm import (
    bigram_frame,
    bigram_lm,
    bigram_lm_scores,
    load_bigram_lm,
    merge_bigram_lm,
    save_bigram_lm,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat"),
    (3, "zebra"),  # 1 token -> excluded from scores
    (4, "purple zebra flies"),
    (5, "  The   CAT\tsat  "),  # tokenizer: lowercase, any-whitespace, no empties
    (6, None),  # NULL text -> excluded
    (7, ""),  # empty -> excluded
]


def _py_scores(docs, train=None):
    """Pure-Python twin of bigram_lm_scores' exact-integer pipeline."""
    train = docs if train is None else train

    def bigrams(t):
        ws = t.lower().split()
        return list(zip(ws, ws[1:]))

    bgs, heads, w2s = collections.Counter(), collections.Counter(), set()
    for _, t in train:
        if t:
            for a, b in bigrams(t):
                bgs[(a, b)] += 1
                heads[a] += 1
                w2s.add(b)
    v = len(w2s)
    out = {}
    for d, t in docs:
        if not t or len(t.split()) < 2:
            continue
        qs, unseen, rare, nlp = [], 0, 0, []
        for a, b in bigrams(t):
            c = bgs.get((a, b))
            num, den = (c or 0) + 1, heads.get(a, 0) + v
            qs.append((2 * num * 10**9 + den) // (2 * den))
            unseen += c is None
            rare += (c or 0) <= 1
            nlp.append(-math.log2(num / den))
        n, s = len(qs), sum(qs)
        out[d] = {
            "n_bigrams": n,
            "n_unseen": unseen,
            "n_rare": rare,
            "mean_p": ((2 * s + n) // (2 * n)) / 1e9,
            "avg_neg_log2p": sum(nlp) / n,
        }
    return out


def test_self_scored_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in bigram_lm_scores(df).collect()}
    want = _py_scores(DOCS)
    assert set(got) == set(want)  # docs 3, 6, 7 excluded
    for d, w in want.items():
        g = got[d]
        assert (g["n_bigrams"], g["n_unseen"], g["n_rare"]) == (
            w["n_bigrams"],
            w["n_unseen"],
            w["n_rare"],
        )
        assert g["mean_p"] == w["mean_p"]  # exact, not approx
        assert g["n_unseen"] == 0  # self-trained: every bigram is in the LM


def test_crosstrain_oov_path(spark):
    train = [(10, "the cat sat on the mat")]
    target = [(20, "the cat flew away")]
    tdf = spark.createDataFrame(train, "doc_id bigint, text string")
    sdf = spark.createDataFrame(target, "doc_id bigint, text string")
    [row] = bigram_lm_scores(sdf, lm=bigram_lm(tdf)).collect()
    want = _py_scores(target, train=train)[20]
    # "the cat" is in the LM; "cat flew" (seen head, unseen bigram) and
    # "flew away" (unseen head -> p = 1/V) both ride the OOV smoothing
    assert row["n_unseen"] == 2 and want["n_unseen"] == 2
    assert row["mean_p"] == want["mean_p"]


def test_perplexity_identity_and_value(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    rows = bigram_lm_scores(df, with_perplexity=True).collect()
    want = _py_scores(DOCS)
    for r in rows:
        # float path: tolerance, not equality (documented non-hashable)
        assert r["avg_neg_log2p"] == pytest.approx(
            want[r["doc_id"]]["avg_neg_log2p"], rel=1e-12
        )
        assert r["perplexity"] == pytest.approx(2 ** r["avg_neg_log2p"], rel=1e-12)


def test_tokenizer_convention(spark):
    df = spark.createDataFrame([(5, "  The   CAT\tsat  ")], "doc_id bigint, text string")
    got = [(r["w1"], r["w2"]) for r in bigram_frame(df).collect()]
    assert got == [("the", "cat"), ("cat", "sat")]


def test_merged_shard_lms_equal_whole_corpus_lm(spark):
    """merge(lm(A), lm(B)) must score identically to lm(A ∪ B) —
    additive counts plus |V| re-derived from the merged bigrams."""
    docs = [(i, f"w{i % 5} common w{i % 3} tail w{i % 7}") for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    whole = bigram_lm(df)
    merged = merge_bigram_lm(
        [bigram_lm(df.filter(F.col("doc_id") % 2 == 0)),
         bigram_lm(df.filter(F.col("doc_id") % 2 == 1))]
    )
    target = spark.createDataFrame(
        [(100, "common tail w2 unseen pair")], "doc_id bigint, text string"
    )
    [a] = bigram_lm_scores(target, lm=whole).collect()
    [b] = bigram_lm_scores(target, lm=merged).collect()
    assert a.asDict() == b.asDict()
    [va] = whole["v"].collect()
    [vb] = merged["v"].collect()
    assert va["v"] == vb["v"]


def test_save_load_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"alpha w{i % 4} beta w{i % 3}") for i in range(40)],
        "doc_id bigint, text string",
    )
    lm = bigram_lm(df)
    save_bigram_lm(lm, str(tmp_path / "lm"))
    loaded = load_bigram_lm(spark, str(tmp_path / "lm"))
    target = spark.createDataFrame([(9, "alpha w1 beta w2")], "doc_id bigint, text string")
    [a] = bigram_lm_scores(target, lm=lm).collect()
    [b] = bigram_lm_scores(target, lm=loaded).collect()
    assert a.asDict() == b.asDict()


def test_merge_empty_raises(spark):
    with pytest.raises(ValueError):
        merge_bigram_lm([])


def test_quantization_is_partitioning_independent(spark):
    """The exact-integer path must give identical mean_p at any
    parallelism (the float path cannot promise this)."""
    docs = [(i, f"alpha beta w{i % 7} gamma w{i % 3} delta") for i in range(200)]
    one = spark.createDataFrame(docs, "doc_id bigint, text string").repartition(1)
    many = spark.createDataFrame(docs, "doc_id bigint, text string").repartition(16)
    a = {r["doc_id"]: r["mean_p"] for r in bigram_lm_scores(one).collect()}
    b = {r["doc_id"]: r["mean_p"] for r in bigram_lm_scores(many).collect()}
    assert a == b
