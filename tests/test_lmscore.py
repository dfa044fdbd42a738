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


def test_ppl_bucket_head_middle_tail(spark):
    """Reference-like docs land in head, gibberish in tail; buckets are
    quantile-sized; zero-token docs bucket NULL."""
    from knightshift_spark.operators.lmscore import ppl_bucket, unigram_logprob_table

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat too") for i in range(20)],
        "doc_id long, text string",
    )
    table = unigram_logprob_table(ref)
    # doc i mixes (30-i) reference tokens with i OOV tokens: scores are
    # DISTINCT and monotonically decreasing in i, so the quantile split
    # is exact thirds (ties would legitimately skew quantile buckets)
    rows = [
        (i, " ".join(["the"] * (30 - i) + [f"xqzzy{j}" for j in range(i)]))
        for i in range(30)
    ] + [(30, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["ppl_bucket"] for r in ppl_bucket(docs, table).collect()}
    assert all(out[i] == "head" for i in range(10))
    assert all(out[i] == "middle" for i in range(11, 20))
    assert all(out[i] == "tail" for i in range(21, 30))
    # the two quantile-boundary docs may fall either side
    assert out[10] in ("head", "middle") and out[20] in ("middle", "tail")
    assert out[30] is None


def test_ppl_bucket_per_group_quantiles(spark):
    """group_col computes quantiles per group: identical scores can land
    in different buckets when their groups' distributions differ."""
    from knightshift_spark.operators.lmscore import ppl_bucket, unigram_logprob_table

    ref = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(5)], "doc_id long, text string"
    )
    table = unigram_logprob_table(ref)
    # group A: mostly reference-like; group B: mostly junk. The shared
    # middling doc text scores the same in both groups but ranks LOW in
    # A and HIGH in B.
    shared = "alpha beta zz yy"
    rows = (
        [(i, "alpha beta gamma delta", "A") for i in range(8)]
        + [(100, shared, "A")]
        + [(200 + i, f"zz{i} qq ww ee", "B") for i in range(8)]
        + [(300, shared, "B")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r["ppl_bucket"]
        for r in ppl_bucket(docs, table, group_col="lang").collect()
    }
    assert out[100] == "tail"  # worst of group A
    assert out[300] == "head"  # best of group B


def test_ppl_bucket_bad_edges(spark):
    from knightshift_spark.operators.lmscore import ppl_bucket, unigram_logprob_table

    ref = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    docs = ref
    import pytest

    with pytest.raises(ValueError):
        ppl_bucket(docs, unigram_logprob_table(ref), edges=(0.7, 0.3))


def test_ppl_bucket_null_group_buckets_null(spark):
    """A NULL group has no quantile row to join back — its docs must
    bucket NULL, not fall through the NULL comparisons into 'middle'."""
    from knightshift_spark.operators.lmscore import ppl_bucket, unigram_logprob_table

    ref = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(5)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma", "A") for i in range(4)]
        + [(10, "alpha beta gamma", None)],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r["ppl_bucket"]
        for r in ppl_bucket(docs, unigram_logprob_table(ref), group_col="lang").collect()
    }
    assert out[10] is None
    assert all(out[i] is not None for i in range(4))
