"""Unigram LM quality scoring (CCNet-style skeleton) vs a DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from knightshift_spark.operators.lmscore import (
    lm_quality_score,
    unigram_logprob_table,
    unseen_logprob,
)

REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cats and dogs and the weather"),
]
DOCS = [
    (10, "the cat sat"),              # fully in-vocab, common words
    (11, "quantum chromodynamics zzz"),  # fully out-of-vocab
    (12, "the zzz"),                  # mixed
    (13, ""),                         # empty -> NULL score
]


@pytest.fixture()
def model(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    return unigram_logprob_table(ref)


def test_table_matches_duckdb_oracle(spark, model):
    rows = model.collect()
    # exactly one reserved NULL-token unseen row rides with the vocab
    assert sum(1 for r in rows if r["token"] is None) == 1
    got = {r["token"]: r["logp"] for r in rows if r["token"] is not None}
    con = duckdb.connect()
    con.execute("CREATE TABLE ref (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO ref VALUES (?, ?)", REF)
    want = dict(
        con.execute(
            r"""
        WITH toks AS (
          SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
          FROM ref WHERE trim(text) <> ''),
        c AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
        s AS (SELECT SUM(n) AS total, COUNT(*) AS vocab FROM c)
        SELECT token, ROUND(ln((n + 1) / (total + vocab + 1)), 12)
        FROM c CROSS JOIN s"""
        ).fetchall()
    )
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_scores_rank_reference_like_text_higher(spark, model):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_quality_score(docs, model).collect()}
    assert set(out) == {10, 11, 12, 13}
    # in-vocab text scores strictly higher than out-of-vocab gibberish
    assert out[10]["avg_logprob"] > out[12]["avg_logprob"] > out[11]["avg_logprob"]
    assert out[13]["avg_logprob"] is None and out[13]["n_tokens"] == 0
    # every OOV token gets exactly the unseen mass: doc 11's average IS it
    assert out[11]["avg_logprob"] == pytest.approx(
        unseen_logprob(model), abs=1e-6
    )


def test_score_matches_hand_computation(spark, model):
    import math

    logp = {r["token"]: r["logp"] for r in model.collect()}
    unseen = unseen_logprob(model)
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r["avg_logprob"] for r in lm_quality_score(docs, model).collect()}
    for doc_id, text in DOCS:
        toks = text.lower().split()
        if not toks:
            continue
        want = sum(logp.get(t, unseen) for t in toks) / len(toks)
        assert out[doc_id] == pytest.approx(want, abs=1e-6), doc_id
    # and the reserved unseen slot really is ln(1/denom): recompute denom
    total = sum(len(t.split()) for _, t in REF)
    vocab = len({w for _, t in REF for w in t.lower().split()})
    assert unseen == pytest.approx(math.log(1.0 / (total + vocab + 1)), abs=1e-9)


def test_partition_invariance(spark, model):
    docs = spark.createDataFrame(DOCS * 5, "doc_id long, text string").repartition(11)
    a = sorted(map(tuple, lm_quality_score(docs, model).collect()))
    b = sorted(map(tuple, lm_quality_score(docs.repartition(1), model).collect()))
    assert a == b


def test_min_count_prunes_tail(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    full = unigram_logprob_table(ref)
    pruned = unigram_logprob_table(ref, min_count=2)
    assert pruned.count() < full.count()
    # only tokens appearing >= 2 times survive
    kept = {r["token"] for r in pruned.collect()}
    assert "the" in kept and "weather" not in kept
