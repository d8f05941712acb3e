"""Corpus-level line/sentence dedup (operators/linededup.py) — the
CCNet/RefinedWeb boilerplate-removal signal. Data-level goldens vs a
pure-Python recomputation, plan-shape guards (single scan via AQE
stage reuse for stats; broadcast vocabulary for strip), hash-mode
parity, and the sentence-split mode on the synthetic pages table."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from data_check_spark.operators.linededup import (
    duplicated_line_hashes,
    line_duplicate_stats,
    strip_duplicate_lines,
)

DOCS = [
    (1, "Cookie  banner\nunique alpha content\nFooter 2024"),
    (2, "cookie banner\nunique beta content\nFooter 2024"),
    # doc 3: boilerplate only (everything duplicated corpus-wide)
    (3, "COOKIE   BANNER\nfooter 2024"),
    # doc 4: no duplicated lines at all
    (4, "entirely original text\nsecond original line"),
    # doc 5: blank/whitespace segments are not lines; internal repeat
    # of a corpus-duplicated line counts at every position
    (5, "  \nCookie banner\n\ncookie banner\nlone line"),
    (6, None),
]


def _py_stats(rows, min_docs=2):
    """Reference recomputation with plain Python."""
    norm = lambda s: re.sub(r"\s+", " ", s.lower()).strip()  # noqa: E731
    per_doc = {}
    for i, t in rows:
        if t is None:
            continue
        segs = [x for x in t.split("\n") if norm(x) != ""]
        per_doc[i] = segs
    freq = Counter()
    for i, segs in per_doc.items():
        for h in {norm(s) for s in segs}:
            freq[h] += 1
    out = {}
    for i, segs in per_doc.items():
        if not segs:
            continue
        dup = sum(1 for s in segs if freq[norm(s)] >= min_docs)
        out[i] = (len(segs), dup)
    return out, freq, per_doc


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_stats_match_python_recomputation(spark):
    got = {
        r["doc_id"]: (r["n_lines"], r["n_dup_lines"])
        for r in line_duplicate_stats(_df(spark)).collect()
    }
    want, _, _ = _py_stats(DOCS)
    assert got == want
    # spot-check the semantics the fixture encodes
    assert got[3] == (2, 2)  # all-boilerplate doc
    assert got[4] == (2, 0)  # fully original doc
    assert got[5] == (3, 2)  # blanks dropped; both banner copies count
    assert 6 not in got  # NULL text has no lines


def test_blank_segment_collapse_is_pinned(spark):
    """The documented CCNet convention: blank segments are formatting,
    not content — they are dropped from text_clean and counted in
    neither n_lines nor n_dropped, so the rewrite collapses paragraph
    breaks even for a document with zero duplicate lines. Consumers
    needing paragraph structure keep the original text column."""
    df = spark.createDataFrame(
        [(1, "Hello\n\nWorld")], "doc_id long, text string"
    )
    r = strip_duplicate_lines(df).collect()[0]
    assert r["text_clean"] == "Hello\nWorld"
    assert (r["n_lines"], r["n_dropped"]) == (2, 0)


def test_strip_preserves_order_and_original_bytes(spark):
    got = {r["doc_id"]: r for r in strip_duplicate_lines(_df(spark)).collect()}
    # survivors keep ORIGINAL bytes (case/extra spaces) in original order
    assert got[1]["text_clean"] == "unique alpha content"
    assert got[4]["text_clean"] == "entirely original text\nsecond original line"
    # all-boilerplate doc stays, empty — dropping it is policy, not dedup
    assert got[3]["text_clean"] == ""
    assert (got[3]["n_lines"], got[3]["n_dropped"]) == (2, 2)
    assert got[5]["text_clean"] == "lone line"
    assert 6 not in got
    # conservation: n_lines == n_dropped + surviving segments
    for r in got.values():
        kept = [x for x in r["text_clean"].split("\n") if x != ""]
        assert r["n_lines"] == r["n_dropped"] + len(kept)


def test_vocabulary_and_external_reuse(spark):
    df = _df(spark)
    vocab = duplicated_line_hashes(df)
    rows = {r["line_hash"]: r["n_docs"] for r in vocab.collect()}
    # exactly the two boilerplate lines: banner (4 docs) + footer (3)
    assert sorted(rows.values()) == [3, 4]
    # a precomputed/persisted vocabulary plugs in unchanged
    via_store = strip_duplicate_lines(df, dup_hashes=vocab)
    direct = strip_duplicate_lines(df)
    assert sorted(map(tuple, via_store.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hash_modes_agree_and_validate(spark):
    df = _df(spark)
    a = sorted(map(tuple, line_duplicate_stats(df, hash_fn="md5").collect()))
    b = sorted(map(tuple, line_duplicate_stats(df, hash_fn="xxhash64").collect()))
    assert a == b
    with pytest.raises(ValueError):
        line_duplicate_stats(df, hash_fn="sha1")
    with pytest.raises(ValueError):
        line_duplicate_stats(df, min_docs=1)
    with pytest.raises(ValueError):
        strip_duplicate_lines(df, min_docs=0)


def test_min_docs_threshold(spark):
    # at min_docs=4 only the banner (4 docs) is boilerplate
    got = {
        r["doc_id"]: r["n_dup_lines"]
        for r in line_duplicate_stats(_df(spark), min_docs=4).collect()
    }
    assert got[1] == 1 and got[2] == 1 and got[3] == 1 and got[4] == 0
    assert got[5] == 2  # both in-doc banner copies


def test_stats_single_scan_via_aqe_reuse(spark, tmp_path):
    """The scan+split+posexplode subtree must execute ONCE: the
    per-hash doc-count aggregation reads the SAME shuffle as the join
    probe (AQE stage reuse), and the explicit repartition satisfies
    the count_distinct distributions so the count branch plans no
    exchange of its own (the cross_doc_ngram discipline)."""
    p = str(tmp_path / "docs.parquet")
    _df(spark).write.parquet(p)
    res = line_duplicate_stats(spark.read.parquet(p))
    res.collect()  # AQE reuse is a runtime decision: inspect post-run
    final = res._jdf.queryExecution().executedPlan().toString()
    final = final.split("== Initial Plan ==")[0]
    assert final.count("ReusedExchange") == 1, final
    assert final.count("FileScan parquet") == 1, final


def test_strip_broadcasts_small_vocabulary(spark, tmp_path):
    """Under the auto-broadcast cap the boilerplate vocabulary joins
    as a broadcast build: line TEXT is never shuffled by hash — the
    per-document regroup is the only text-bearing exchange."""
    p = str(tmp_path / "docs2.parquet")
    _df(spark).write.parquet(p)
    res = strip_duplicate_lines(spark.read.parquet(p))
    res.collect()
    final = res._jdf.queryExecution().executedPlan().toString()
    final = final.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final, final


def test_sentence_mode_on_synth_pages(spark):
    """The synth pages generator (sources/synth.py) draws each page's
    phrase from a 32-value family and repeats it k times — so at the
    SENTENCE level ('. ' separator) phrase sentences are corpus-wide
    boilerplate while the unique DOC[sha] prefix sentence is not.
    strip with sentence splitting must keep exactly that structure."""
    from data_check_spark.sources.synth import synth_pages

    pages = synth_pages(spark, 400).filter(F.col("text").isNotNull())
    pages = pages.select(F.col("url").alias("doc_id"), "text").dropDuplicates(["doc_id"])
    out = strip_duplicate_lines(
        pages, "doc_id", "text", min_docs=2, sep_regex=r"\. ", joiner=". "
    ).collect()
    assert len(out) > 300
    dropped_any = [r for r in out if r["n_dropped"] > 0]
    assert len(dropped_any) > 250  # 32 phrase families over 400 pages
    for r in out:
        # the DOC[...] prefix rides the first phrase sentence; what
        # survives must never be a bare repeated phrase sentence
        if r["text_clean"]:
            assert r["text_clean"].startswith("DOC[")


def test_vocabulary_incremental_resum_equals_full(spark):
    """The persistable store contract: min_docs=1 counts from two
    disjoint-id increments, unioned and re-summed per hash, equal the
    full-corpus recompute exactly (doc ids never repeat across
    increments, so doc frequencies add)."""
    df = _df(spark)
    old = df.filter(F.col("doc_id") <= 3)
    new = df.filter(F.col("doc_id") > 3)
    full = {
        (r["line_hash"], r["n_docs"])
        for r in duplicated_line_hashes(df, min_docs=2).collect()
    }
    merged = (
        duplicated_line_hashes(old, min_docs=1)
        .unionByName(duplicated_line_hashes(new, min_docs=1))
        .groupBy("line_hash")
        .agg(F.sum("n_docs").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    assert {(r["line_hash"], r["n_docs"]) for r in merged.collect()} == full
    with pytest.raises(ValueError):
        duplicated_line_hashes(df, min_docs=0)
