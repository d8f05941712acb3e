import pyspark.sql.functions as F
import pytest

from data_check_spark.functions.textstats import (
    bag_of_words_fingerprint,
    bpe_ish_token_count,
    digit_ratio,
    lang_guess,
    mean_word_length,
    punct_ratio,
    quality_score,
    rolling_hash_fingerprint,
    token_count,
)
from data_check_spark.operators.multimodal import extract_media_metadata, frame_sample_stub


@pytest.fixture(scope="module")
def texts(spark):
    return spark.createDataFrame(
        [
            (1, "the cat and the dog sat in a box"),
            (2, "der hund und die katze sind nicht da"),
            (3, "le chat est une bête pour la maison"),
            (4, "xyzzy plugh"),
            (5, None),
            (6, "a1 b2, c3! 42"),
        ],
        "doc_id bigint, text string",
    )


def test_token_counts(texts):
    r = {x["doc_id"]: x for x in texts.select(
        "doc_id", token_count(F.col("text")).alias("tc"),
        bpe_ish_token_count(F.col("text")).alias("bc")).collect()}
    assert r[1]["tc"] == 9
    assert r[5]["tc"] is None
    # "a1 b2, c3! 42" → a,1,b,2,',',c,3,'!',42 = 9 bpe-ish pieces
    assert r[6]["bc"] == 9


def test_ratios_and_quality(texts):
    r = {x["doc_id"]: x for x in texts.select(
        "doc_id",
        punct_ratio(F.col("text")).alias("p"),
        digit_ratio(F.col("text")).alias("d"),
        mean_word_length(F.col("text")).alias("m"),
        quality_score(F.col("text")).alias("q")).collect()}
    assert r[1]["p"] == 0.0
    assert r[6]["d"] == pytest.approx(5 / 10)  # digits 1,2,3,4,2 of 10 non-space chars
    assert r[1]["m"] == pytest.approx(24 / 9)
    assert 0.0 <= r[1]["q"] <= 1.0 and r[5]["q"] is None


def test_lang_guess(texts):
    r = {x["doc_id"]: x["g"] for x in texts.select(
        "doc_id", lang_guess(F.col("text")).alias("g")).collect()}
    assert r[1] == "en"
    assert r[2] == "de"
    assert r[3] == "fr"
    assert r[4] == "und"
    assert r[5] is None


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
        "doc_id bigint, text string",
    )
    fp = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", bag_of_words_fingerprint(F.col("text")).alias("f")).collect()}
    assert fp[1] == fp[2]  # order-insensitive
    assert fp[1] != fp[3]
    long = " ".join(f"w{i}" for i in range(100))
    d2 = spark.createDataFrame([(1, long), (2, long)], "doc_id bigint, text string")
    rh = [r["f"] for r in d2.select(rolling_hash_fingerprint(F.col("text")).alias("f")).collect()]
    assert rh[0] == rh[1]


def test_media_metadata(spark):
    rows = [
        (1, b"\xff\xd8" + b"x" * 100),
        (2, b"\x89PNG\r\n\x1a\n" + b"y" * 50),
        (3, b"plain"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    m = {r["doc_id"]: r for r in extract_media_metadata(df).collect()}
    assert m[1]["format"] == "jpeg" and m[1]["byte_len"] == 102
    assert m[2]["format"] == "png"
    assert m[3]["format"] == "unknown" and m[3]["width"] == 5 % 64 + 1
    assert m[4]["ok"] is False and m[4]["byte_len"] is None
    frames = frame_sample_stub(df, every_n=10).collect()
    assert all(f["frame_idx"] % 10 == 0 for f in frames)
    assert {f["doc_id"] for f in frames} == {1, 2, 3}


def test_decoder_typo_rejected(spark):
    """'PIL'/'pillow' typos must not silently pick the stub and return
    fabricated metadata labeled ok=True."""
    from data_check_spark.operators import multimodal as mm

    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, blob binary")
    for bad in ("PIL", "pillow", "real"):
        with pytest.raises(ValueError, match="decoder"):
            mm.extract_media_metadata(df, decoder=bad)


def test_decoder_pil_gated(spark):
    """decoder='pil' decodes a real PNG header behind the same
    mapInPandas contract (skips where Pillow is absent); the stub
    stays the deterministic default; decoder='auto' never raises."""
    from data_check_spark.operators import multimodal as mm

    if not mm.HAVE_PIL:
        df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, blob binary")
        with pytest.raises(ImportError, match="Pillow"):
            mm.extract_media_metadata(df, decoder="pil")
        # auto degrades to the stub without error
        row = mm.extract_media_metadata(df, decoder="auto").collect()[0]
        assert row["format"] == "unknown" and row["ok"]
        pytest.skip("Pillow not installed — real-decode path exercised on clusters with PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 3)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id long, blob binary")
    row = mm.extract_media_metadata(df, decoder="pil").collect()[0]
    assert (row["format"], row["width"], row["height"], row["ok"]) == ("png", 7, 3, True)


def test_add_text_metrics_matches_individual_functions(spark, sf_dir):
    """The fused two-stage pass must be bit-identical to the individual
    functions AND its physical plan must keep the counter Project
    uncollapsed (each regex counter aliased exactly once)."""
    import pyspark.sql.functions as F

    from data_check_spark.functions.textstats import (
        add_text_metrics,
        bpe_ish_token_count,
        digit_ratio,
        lang_guess,
        mean_word_length,
        punct_ratio,
        quality_score,
        token_count,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    sep = d.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(mean_word_length(t), 4).alias("mean_word_len"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(digit_ratio(t), 6).alias("digit_ratio"),
        quality_score(t).alias("quality"),
        lang_guess(t).alias("lang_guess"),
    )
    fused = add_text_metrics(d.select("doc_id", "text"), "text")
    assert sorted(map(tuple, sep.collect())) == sorted(map(tuple, fused.collect()))
    # NULL text row exercised explicitly
    nd = spark.createDataFrame([(1, None), (2, "the cat and the dog")], "doc_id long, text string")
    row = {r["doc_id"]: r for r in add_text_metrics(nd, "text").collect()}
    assert row[1]["n_tokens"] is None and row[1]["quality"] is None and row[1]["lang_guess"] is None
    assert row[2]["lang_guess"] == "en"
    # plan shape: counters materialized once — the lower Project
    # carries one regexp alias per counter and is NOT collapsed into
    # the metric Project (which would re-duplicate the regexes)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Project") >= 3


def test_encoding_metrics_counts(spark):
    from data_check_spark.functions.textstats import (
        control_char_count,
        encoding_suspect,
        mojibake_count,
        replacement_char_count,
    )

    repl = chr(0xFFFD)
    moj_e = chr(0xC3) + chr(0xA9)          # e-acute read as Latin-1
    moj_q1 = chr(0xE2) + chr(0x20AC) + chr(0x2122)  # U+2019 as cp1252
    moj_q2 = chr(0xE2) + chr(0x20AC) + chr(0x0153)  # U+201C as cp1252
    rows = [
        (0, "clean ascii text"),
        (1, "bad " + repl + " twice " + repl),
        (2, "caf" + moj_e + " and " + moj_q1 + "quoted" + moj_q2),
        (3, "ctrl" + chr(1) + "here" + chr(2) + "and tab" + chr(9)
            + "ok" + chr(10) + "newline"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            replacement_char_count(F.col("text")).alias("nr"),
            mojibake_count(F.col("text")).alias("nm"),
            control_char_count(F.col("text")).alias("nc"),
            encoding_suspect(F.col("text")).alias("sus"),
        ).collect()
    }
    assert (got[0]["nr"], got[0]["nm"], got[0]["nc"], got[0]["sus"]) == (
        0, 0, 0, False,
    )
    assert got[1]["nr"] == 2 and got[1]["sus"] is True
    assert got[2]["nm"] == 3 and got[2]["nr"] == 0 and got[2]["sus"] is True
    # tab/newline/CR are not control scars; chr(1) and chr(2) are
    assert got[3]["nc"] == 2 and got[3]["sus"] is True
    assert got[4]["nr"] is None and got[4]["sus"] is None


def test_canonical_text_collapses_confusables(spark):
    """Decomposed accents and invisible chars must canonicalize to the
    same bytes as their clean twins — the invariant the dedup hashers
    rely on."""
    from data_check_spark.functions.normalize import (
        canonical_text,
        strip_invisible,
    )

    rows = [
        (0, "caf" + chr(0xE9)),                      # precomposed
        (1, "cafe" + chr(0x301)),                    # decomposed
        (2, "caf" + chr(0x200B) + chr(0xE9)),        # ZWSP inside
        (3, "caf" + chr(0xE9) + chr(0xAD)),          # soft hyphen
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", canonical_text(F.col("text")).alias("c")
        ).collect()
    }
    assert got[0] == got[1] == got[2] == got[3] == "caf" + chr(0xE9)
    assert got[4] is None
    # strip_invisible alone leaves normalization untouched
    si = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", strip_invisible(F.col("text")).alias("s")
        ).collect()
    }
    assert si[1] == "cafe" + chr(0x301)  # still decomposed
    assert si[2] == "caf" + chr(0xE9)
