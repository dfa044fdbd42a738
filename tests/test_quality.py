"""Gopher repetition filter tests: hand-computed fractions on crafted
documents, the full stats join, and the pass/fail screen."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knightshift_spark.operators.quality import (
    GOPHER_THRESHOLDS,
    gopher_repetition_filter,
    gopher_repetition_stats,
    line_repetition_stats,
    ngram_repetition_stats,
)


def test_line_repetition_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\ngamma"),      # 4 lines, 1 dup occurrence
            (2, "one\ntwo\nthree"),                 # no dups
            (3, "x\n\n  \nx\nx"),                   # blanks ignored; x ×3
            (4, ""),                                # empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_repetition_stats(docs).collect()}
    # doc 1: dup lines 1/4; chars: alpha(5)*2 + beta(4) + gamma(5) = 19, dup 5
    assert got[1]["n_lines"] == 4
    assert got[1]["dup_line_frac"] == pytest.approx(0.25)
    assert got[1]["dup_line_char_frac"] == pytest.approx(round(5 / 19, 4))
    assert got[2]["dup_line_frac"] == 0.0
    # doc 3: 3 non-blank lines, 2 dup occurrences
    assert got[3]["n_lines"] == 3
    assert got[3]["dup_line_frac"] == pytest.approx(round(2 / 3, 4))
    assert 4 not in got  # no non-blank lines → no row (stats join fills 0)


def test_ngram_repetition_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y x y")], "doc_id long, text string"
    )
    r = ngram_repetition_stats(docs, n=2).collect()[0]
    # 2-grams: "x y"×3, "y x"×2; mass/occurrence = 2 chars each
    # total 10, top 6, dup (all counts>1) 10
    assert r["top_2gram_char_frac"] == pytest.approx(0.6)
    assert r["dup_2gram_char_frac"] == pytest.approx(1.0)

    varied = spark.createDataFrame(
        [(2, "one two three four five six")], "doc_id long, text string"
    )
    r2 = ngram_repetition_stats(varied, n=2).collect()[0]
    assert r2["dup_2gram_char_frac"] == 0.0
    # gram masses: one-two 6, two-three 8, three-four 9, four-five 8,
    # five-six 7 → total 38, top "three four" 9
    assert r2["top_2gram_char_frac"] == pytest.approx(round(9 / 38, 4))


def test_gopher_stats_join_fills_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in gopher_repetition_stats(docs, (2,), (5,)).collect()}
    assert set(got) == {1, 2}
    # doc 1 has one 2-gram, zero 5-grams; doc 2 nothing — all zeros, no nulls
    assert got[1]["dup_5gram_char_frac"] == 0.0
    assert got[2]["top_2gram_char_frac"] == 0.0
    assert all(v is not None for r in got.values() for v in r.asDict().values())


def test_gopher_filter_screens_boilerplate(spark):
    normal = (
        "the committee published its findings on thursday after a long "
        "review of the evidence and recommended several policy changes "
        "to be considered by parliament next session"
    )
    spam_lines = "click here\n" * 20 + "unique closing line"
    spam_grams = "buy cheap pills now " * 15
    docs = spark.createDataFrame(
        [(1, normal), (2, spam_lines), (3, spam_grams)],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in gopher_repetition_filter(docs).collect())
    assert kept == [1]
    # a lines-only subset screen readmits the n-gram spammer (one line,
    # no line dups) while still rejecting the line spammer (19/21 dup)
    lenient = gopher_repetition_filter(
        docs, thresholds={"dup_line_frac": 0.5, "dup_line_char_frac": 0.5}
    )
    assert sorted(r["doc_id"] for r in lenient.collect()) == [1, 3]


def test_thresholds_are_the_published_set():
    assert GOPHER_THRESHOLDS["dup_line_frac"] == 0.30
    assert GOPHER_THRESHOLDS["top_2gram_char_frac"] == 0.20
    assert GOPHER_THRESHOLDS["dup_10gram_char_frac"] == 0.10
    assert len(GOPHER_THRESHOLDS) == 11


def test_unknown_threshold_key_raises(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown repetition threshold"):
        gopher_repetition_filter(docs, thresholds={"dup_5gram_frac": 0.15})
