"""Tokenizer / media-codec seam contract: swapping the implementation —
and ONLY the implementation — changes behavior without touching operator
or pipeline code (VERDICT r2 #8 acceptance)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from knightshift_spark.operators.multimodal import extract_features
from knightshift_spark.operators.tokenize import subtoken_count
from knightshift_spark.seams import (
    FakeHashCodec,
    RegexSubwordTokenizer,
    WhitespaceTokenizer,
)


@dataclass(frozen=True)
class _PythonOnlyRegexTokenizer:
    """The default tokenizer's encode WITHOUT count_expr: forces the
    Arrow path so the two paths can be compared on identical semantics."""

    def encode(self, text):
        return RegexSubwordTokenizer().encode(text)


@dataclass(frozen=True)
class _CharTokenizer:
    """Second fake swapped in via the seam only (the acceptance check)."""

    def encode(self, text):
        return list(text) if text else []


@dataclass(frozen=True)
class _ConstantCodec:
    dim: int = 4

    def features(self, payload):
        return [1.0] * self.dim


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello, world!"), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )


def test_jvm_and_python_paths_agree(spark):
    """The regex tokenizer's JVM expression and its Python encode are the
    same function — counts must match exactly on every row."""
    docs = _docs(spark)
    jvm = {r["doc_id"]: r["n_subtokens"] for r in subtoken_count(docs).collect()}
    py = {
        r["doc_id"]: r["n_subtokens"]
        for r in subtoken_count(docs, _PythonOnlyRegexTokenizer()).collect()
    }
    assert jvm == py
    assert jvm[1] == 4  # hello , world !
    assert jvm[3] == 0 and jvm[4] == 0


def test_swapping_tokenizer_changes_only_the_counts(spark):
    docs = _docs(spark)
    chars = {r["doc_id"]: r["n_subtokens"] for r in subtoken_count(docs, _CharTokenizer()).collect()}
    ws = {r["doc_id"]: r["n_subtokens"] for r in subtoken_count(docs, WhitespaceTokenizer()).collect()}
    assert chars[1] == len("hello, world!")
    assert ws[1] == 2 and ws[2] == 3
    # same output contract either way, including NULL/empty → 0
    assert set(chars) == set(ws) == {1, 2, 3, 4}
    assert ws[3] == 0 and ws[4] == 0 and chars[4] == 0


def test_swapping_codec_changes_only_the_features(spark):
    media = spark.createDataFrame(
        [(1, b"abc"), (2, None)], "media_id long, payload binary"
    )
    fake = {r["media_id"]: r["feature"] for r in extract_features(media, dim=4).collect()}
    const = {
        r["media_id"]: r["feature"]
        for r in extract_features(media, codec=_ConstantCodec()).collect()
    }
    assert len(fake[1]) == 4 and fake[1] != const[1]
    assert const[1] == [1.0] * 4 and const[2] == [1.0] * 4
    # default codec is deterministic: same payload, same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=4).collect()}
    assert again == fake


def test_q35_routes_through_the_seam(spark):
    """q35's subword column equals the seam default's output — the query
    does not carry its own tokenizer logic."""
    from knightshift_spark.queries import load_all
    from tests.conftest import SF_SMOKE

    q35 = load_all()["q35_token_count"].spark_fn(spark, SF_SMOKE)
    from knightshift_spark.tables import load_table

    seam = subtoken_count(load_table(spark, SF_SMOKE, "documents"))
    mismatch = (
        q35.select("doc_id", "n_subtokens")
        .exceptAll(seam.select("doc_id", "n_subtokens"))
        .count()
    )
    assert mismatch == 0


def test_resize_media_contract(spark):
    """resize_media: shapes and metadata are real even though the fake
    codec's pixels are not; a second codec drops in via the seam only."""
    from knightshift_spark.operators.multimodal import resize_media

    media = spark.createDataFrame(
        [(1, b"abcdef"), (2, b""), (3, None)], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in resize_media(media, 4, 3).collect()}
    assert len(out[1]["payload"]) == 12 and out[1]["meta"]["n_bytes"] == 12
    assert out[1]["meta"]["width"] == 4 and out[1]["meta"]["height"] == 3
    assert len(out[2]["payload"]) == 12  # empty payload still shapes up
    assert out[3]["payload"] is None and out[3]["meta"]["n_bytes"] is None

    class DoubleCodec:
        def resize(self, payload, width, height):
            return None if payload is None else (b"xy" * (width * height))[: width * height]

    swapped = {r["media_id"]: r for r in resize_media(media, 2, 2, DoubleCodec()).collect()}
    assert swapped[1]["payload"] == b"xyxy"


# -- real BPE through the seam ----------------------------------------------


def test_bpe_learns_frequent_merges():
    from knightshift_spark.operators.bpe import BPETokenizer, train_bpe

    corpus = ["low low low low low", "lower lower", "newest newest newest"]
    merges = train_bpe(corpus, num_merges=50)
    tok = BPETokenizer(merges=tuple(merges))
    # the dominant word collapses to a single token
    assert tok.encode("low") == ["low"]
    # frequent subparts reused: 'lower' starts with the learned 'low'
    assert tok.encode("lower")[0].startswith("low")
    # unseen word degrades to smaller units, never crashes
    pieces = tok.encode("lowest")
    assert "".join(pieces) == "lowest"
    assert tok.encode("") == [] and tok.encode(None) == []


def test_bpe_deterministic_and_lossless():
    from hypothesis import given, settings, strategies as st

    from knightshift_spark.operators.bpe import BPETokenizer, train_bpe

    corpus = ["the cat sat on the mat", "the cats sat", "a cat can nap"]
    m1, m2 = train_bpe(corpus, 30), train_bpe(corpus, 30)
    assert m1 == m2
    tok = BPETokenizer(merges=tuple(m1))

    @settings(max_examples=50, deadline=None)
    @given(st.text(alphabet="abcdehmnopst ", max_size=40))
    def lossless(s):
        # concatenated tokens reproduce the pre-tokenized words exactly
        import re

        from knightshift_spark.seams import SUBWORD_PATTERN

        assert "".join(tok.encode(s)) == "".join(re.findall(SUBWORD_PATTERN, s))

    lossless()


def test_bpe_through_spark_seam(spark):
    from knightshift_spark.operators.bpe import train_bpe_on_corpus
    from knightshift_spark.operators.tokenize import subtoken_count

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cats sat on the mats"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    tok = train_bpe_on_corpus(docs, num_merges=40, sample=10)
    assert len(tok.merges) > 0
    got = {r["doc_id"]: r["n_subtokens"] for r in subtoken_count(docs, tok).collect()}
    # Arrow path agrees with a driver-side encode, including NULL → 0
    assert got[1] == len(tok.encode("the cat sat on the mat"))
    assert got[2] == len(tok.encode("the cats sat on the mats"))
    assert got[3] == 0
    # the learned tokenizer is coarser than characters and finer than or
    # equal to whole words
    assert 6 <= got[1] <= len("the cat sat on the mat".replace(" ", ""))


def test_bpe_save_load_roundtrip(spark, tmp_path):
    from knightshift_spark.operators.bpe import load_bpe, save_bpe, train_bpe, BPETokenizer

    merges = train_bpe(["the cat sat on the mat the cat sat"], 25)
    tok = BPETokenizer(merges=tuple(merges))
    path = str(tmp_path / "bpe_vocab")
    save_bpe(tok, spark, path)
    back = load_bpe(spark, path)
    assert back.merges == tok.merges
    assert back.encode("the cats sat") == tok.encode("the cats sat")
