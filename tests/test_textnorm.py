"""Unicode normalization pass (operators.textnorm).

Pins: NFKC folds compatibility forms the dedup hashes would otherwise
miss; byte hygiene strips controls/zero-width but keeps \\n and \\t;
idempotence; null passthrough; the JVM tier stays Python-free.
"""

import pyspark.sql.functions as F
import pytest

from knightshift_spark.operators.textnorm import (
    clean_text,
    nfkc_normalize,
    normalize_text,
)


def test_nfkc_folds_compatibility_forms(spark):
    docs = spark.createDataFrame(
        [
            (1, "ﬁle ①"),          # ligature + circled digit
            (2, "Ａｂｃ"),           # full-width
            (3, "café"),  # decomposed accent (e + combining acute)
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in nfkc_normalize(docs).collect()}
    assert out[1] == "file 1"
    assert out[2] == "Abc"
    assert out[3] == "caf\u00e9"  # composed
    assert out[4] is None


def test_normalization_makes_dups_hashable(spark):
    """The motivating property: two visually-identical docs in different
    normalization forms fingerprint apart RAW and together NORMALIZED."""
    from knightshift_spark.functions.text import doc_fingerprint

    docs = spark.createDataFrame(
        [(1, "café ﬁle"), (2, "café file")], "doc_id long, text string"
    )
    raw = docs.select(doc_fingerprint(F.col("text")).alias("fp")).distinct().count()
    norm = (
        nfkc_normalize(docs)
        .select(doc_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )
    assert raw == 2 and norm == 1


def test_clean_text_strips_noise_keeps_structure(spark):
    docs = spark.createDataFrame(
        [(1, "a\x00b​c\r\nd\te\x07"), (2, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in clean_text(docs).collect()}
    assert out[1] == "abc\nd\te"
    assert out[2] is None
    collapsed = {
        r["doc_id"]: r["text"]
        for r in clean_text(docs, collapse_spaces=True).collect()
    }
    assert collapsed[1] == "abc\nd e"


def test_full_pass_idempotent(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["Ａ\x00ﬁle\r\n①", "plain text", ""])],
        "doc_id long, text string",
    )
    once = normalize_text(docs)
    twice = normalize_text(once)
    assert sorted((r["doc_id"], r["text"]) for r in once.collect()) == sorted(
        (r["doc_id"], r["text"]) for r in twice.collect()
    )


def test_jvm_tier_is_python_free(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = clean_text(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_bad_form_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        nfkc_normalize(docs, form="NFX")


def test_normalize_stage_in_curation_funnel(spark):
    """normalize={'form': 'NFKC'} folds form-variant duplicates BEFORE
    the exact-dedup fingerprint, so they leave through the funnel's
    exact_dup_removed row instead of surviving as distinct docs."""
    from knightshift_spark.pipelines.corpus import curate_corpus

    docs = spark.createDataFrame(
        [
            (1, "five fine fish figure the final fight", "s"),
            (2, "five fine fish figure the final fight".replace("fi", "ﬁ"), "s"),
        ],
        "doc_id long, text string, source string",
    )
    # the two texts differ (fi ligature) without normalization...
    raw = curate_corpus(docs, min_tokens=0, langs=("en", "und"))
    assert raw.kept.count() == 2
    # ...and fold into one with it
    norm = curate_corpus(
        docs, min_tokens=0, langs=("en", "und"), normalize={"form": "NFKC"}
    )
    assert sorted(r["doc_id"] for r in norm.kept.collect()) == [1]
    stats = {r["reason"]: r["n"] for r in norm.stats.collect()}
    assert stats["exact_dup_removed"] == 1
