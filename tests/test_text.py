"""Text-analysis function edge cases (empty text, mixed whitespace)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knightshift_spark.functions import text as T


def _vals(spark, data, fn):
    df = spark.createDataFrame([(d,) for d in data], "x string")
    return [r["v"] for r in df.select(fn(F.col("x")).alias("v")).collect()]


def test_token_count(spark):
    assert _vals(spark, ["a b  c", "", "   ", "one"], T.token_count) == [3, 0, 0, 1]


def test_normalize_and_fingerprint(spark):
    fps = _vals(spark, ["Hello   World", "hello world", "hello  world "], T.doc_fingerprint)
    assert fps[0] == fps[1] == fps[2]


def test_lang_id(spark):
    out = _vals(
        spark,
        [
            "the cat sat on the mat and it is a good day for the dog",
            "le chat est sur la table et il est un des animaux",
            "der hund ist ein tier und das ist nicht schlecht",
            "xyzzy qwerty plugh foobar",
            "",
        ],
        T.lang_id,
    )
    assert out == ["en", "fr", "de", "und", "und"]


def test_quality_score_bounds(spark):
    vals = _vals(
        spark,
        ["", "word", "the and of to in is it for on with " * 10],
        T.quality_score,
    )
    assert all(v is not None and 0.0 <= v <= 1.0 for v in vals)
    assert vals[0] == 0.0
    assert vals[2] > vals[1]


def test_repetition_ratio(spark):
    from knightshift_spark.functions.text import repetition_ratio, tokens

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # bigrams: ab,ba,ab,ba,ab -> 2 distinct of 5
            (2, "all distinct words here"),  # 3 distinct of 3
            (3, "one"),                  # <2 tokens
            (4, ""),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", tokens(F.lower("text")).alias("__tk")
        ).select("doc_id", F.round(repetition_ratio(F.col("__tk")), 4).alias("r")).collect()
    }
    assert out[1] == 0.6
    assert out[2] == 0.0
    assert out[3] == 0.0
    assert out[4] == 0.0
