"""BM25 / TF-IDF ranking vs serial Python references."""

from __future__ import annotations

import math

import pytest

from knightshift_spark.operators.ranking import (
    bm25_reference,
    bm25_scores,
    term_frequencies,
    tfidf_topk,
)

CORPUS = {
    1: "the cat sat on the mat",
    2: "the dog chased the cat around the yard",
    3: "quantum field theory for the working mathematician",
    4: "cat cat cat",
    5: "a yard of quantum cats",
    6: "",
}


def _docs_df(spark):
    return spark.createDataFrame(
        list(CORPUS.items()), "doc_id bigint, text string"
    )


def test_bm25_matches_reference(spark):
    got = {
        r.doc_id: r.bm25
        for r in bm25_scores(_docs_df(spark), ["cat", "quantum"]).collect()
    }
    want = bm25_reference(CORPUS, ["cat", "quantum"])
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-6)


def test_bm25_repeated_term_saturates(spark):
    # doc 4 is pure "cat" ×3 — tf saturation (k1) must keep its score
    # finite and above single-mention docs
    got = {
        r.doc_id: r.bm25 for r in bm25_scores(_docs_df(spark), ["cat"]).collect()
    }
    assert got[4] > got[1] > 0
    assert got[4] < got[1] * 3  # saturated, not linear in tf


def test_bm25_no_match_no_row(spark):
    rows = bm25_scores(_docs_df(spark), ["zebra"]).collect()
    assert rows == []


def test_term_frequencies_counts(spark):
    tf = {
        (r.doc_id, r.term): (r.tf, r.doc_len)
        for r in term_frequencies(_docs_df(spark)).collect()
    }
    assert tf[(1, "the")] == (2, 6)
    assert tf[(4, "cat")] == (3, 3)
    assert (6, "") not in tf  # empty doc contributes no terms


def test_tfidf_topk_ranks_distinctive_terms(spark):
    top = tfidf_topk(_docs_df(spark), k=2)
    by_doc = {}
    for r in top.collect():
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf))
    # doc 3's distinctive vocabulary outranks the shared stopword "the"
    terms3 = [t for _, t, _ in sorted(by_doc[3])]
    assert "the" not in terms3
    # ranks are 1..k with the documented total order
    for d, rows in by_doc.items():
        ranks = [rk for rk, _, _ in sorted(rows)]
        assert ranks == list(range(1, len(rows) + 1))
        scores = [s for _, _, s in sorted(rows)]
        assert scores == sorted(scores, reverse=True)


def test_tfidf_reference_value(spark):
    # hand-check one cell: doc 4, term "cat": tf=3, doc_len=3, df=3
    # (docs 1, 2, 4 — doc 5 has "cats", a different token), N=6
    top = tfidf_topk(_docs_df(spark), k=1)
    row = [r for r in top.collect() if r.doc_id == 4][0]
    want = round((3 / 3) * (math.log((1 + 6) / (1 + 3)) + 1.0), 6)
    assert row.term == "cat" and row.tfidf == pytest.approx(want, abs=1e-6)


def test_text_index_query_equals_inline_bm25(spark, tmp_path):
    """query_text_index must reproduce bm25_scores exactly (same idf,
    same decimal accumulation, same order) while reading ONLY the query
    terms' bucket partitions."""
    from knightshift_spark.operators.ranking import (
        bm25_scores,
        query_text_index,
        write_text_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "inverted")
    write_text_index(docs, idx, n_buckets=16)
    terms = ["the", "model", "data"]
    want = [
        (r["doc_id"], r["n_terms_matched"], r["bm25"])
        for r in bm25_scores(docs, terms).limit(10).collect()
    ]
    out = query_text_index(spark, idx, terms, k=10)
    got = [
        (r["doc_id"], r["n_terms_matched"], r["bm25"]) for r in out.collect()
    ]
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan  # partition filter reached the scan
    # directory-level pruning: at most |terms| bucket dirs are readable
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*__bucket", plan)
    assert m, plan[:1500]
