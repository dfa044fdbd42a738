"""Persisted LSH index: write once, append, query incoming batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knightshift_spark.operators.dedup import (
    append_lsh_index,
    lsh_candidate_pairs,
    query_lsh_index,
    write_lsh_index,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog by the river"),
    (2, "an entirely different document about databases and storage engines"),
    (3, "yet another text on chess openings and endgame technique today"),
]
BATCH = [
    (101, "the quick brown fox jumps over the lazy dog by the river"),  # dup of 1
    (102, "novel content nothing in the corpus resembles even slightly here"),
    (103, "novel content nothing in the corpus resembles even slightly here"),  # dup of 102
]


@pytest.fixture()
def index_path(spark, tmp_path):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    path = str(tmp_path / "lsh_index")
    write_lsh_index(docs, path, num_hashes=16, bands=4)
    return path


def test_query_finds_cross_and_within_pairs(spark, index_path):
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in query_lsh_index(spark, index_path, batch).collect()
    }
    assert (1, 101) in pairs          # new dup of an indexed doc
    assert (102, 103) in pairs        # within-batch dup
    assert not any(b in (102, 103) and a in (1, 2, 3) for a, b in pairs)


def test_query_equals_full_recompute_on_union(spark, index_path):
    """The incremental path loses nothing: index-query pairs involving
    new docs == full lsh_candidate_pairs over corpus ∪ batch, restricted
    to pairs touching the batch."""
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    full = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(corpus.unionByName(batch), 16, 4).collect()
        if r["doc_a"] > 100 or r["doc_b"] > 100
    }
    inc = {
        tuple(sorted((r["doc_a"], r["doc_b"])))
        for r in query_lsh_index(spark, index_path, batch).collect()
    }
    assert inc == {tuple(sorted(p)) for p in full}


def test_append_grows_the_index(spark, index_path):
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    append_lsh_index(batch, index_path)
    later = spark.createDataFrame(
        [(201, "novel content nothing in the corpus resembles even slightly here")],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in query_lsh_index(spark, index_path, later).collect()
    }
    # the appended batch docs are now index-side
    assert (102, 201) in pairs and (103, 201) in pairs


def test_max_bucket_star_caps_corpus_fanout(spark, tmp_path):
    """An over-occupied corpus bucket (many identical indexed docs)
    pairs a new duplicate with the bucket representative only."""
    same = "the exact same duplicated document text appears many many times"
    corpus = spark.createDataFrame(
        [(i, same) for i in range(30)], "doc_id long, text string"
    )
    path = str(tmp_path / "dupidx")
    write_lsh_index(corpus, path, num_hashes=16, bands=4)
    batch = spark.createDataFrame([(500, same)], "doc_id long, text string")
    capped = query_lsh_index(
        spark, path, batch, max_bucket=5, include_within_batch=False
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(0, 500)}
    uncapped = query_lsh_index(
        spark, path, batch, include_within_batch=False
    ).collect()
    assert len(uncapped) == 30


def test_meta_is_pinned(spark, index_path):
    meta = spark.read.parquet(f"{index_path}/_lsh_meta").collect()[0]
    assert (meta["num_hashes"], meta["bands"]) == (16, 4)
    # the index main read does NOT pick up the underscore sidecar
    cols = set(spark.read.parquet(index_path).columns)
    assert cols == {"doc_id", "band", "bucket"}


def test_replayed_id_yields_no_self_pair(spark, index_path):
    """A batch re-sending an already-indexed doc under its ORIGINAL id
    (replay/backfill) must not pair the doc with itself."""
    replay = spark.createDataFrame(CORPUS[:1], "doc_id long, text string")
    pairs = query_lsh_index(
        spark, index_path, replay, include_within_batch=False
    ).collect()
    assert all(r["doc_a"] != r["doc_b"] for r in pairs)
    capped = query_lsh_index(
        spark, index_path, replay, max_bucket=1, include_within_batch=False
    ).collect()
    assert all(r["doc_a"] != r["doc_b"] for r in capped)
