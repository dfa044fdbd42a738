"""corpus_card: release-card numbers vs a DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from knightshift_spark.operators.profiling import corpus_card

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    from knightshift_spark.tables import load_table

    return load_table(spark, SF, "documents")


def test_overview_matches_duckdb(spark, docs):
    card = corpus_card(docs)
    got = card.overview.collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(
        r"""
        SELECT COUNT(*) AS n_docs,
               SUM(len(text)) AS total_chars,
               SUM(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END) AS total_tokens,
               COUNT(DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')))
                 AS n_distinct_texts
        FROM documents"""
    ).fetchone()
    assert (got["n_docs"], got["total_chars"], got["total_tokens"],
            got["n_distinct_texts"]) == want
    assert got["mean_tokens"] == pytest.approx(want[2] / want[0], abs=1e-3)


def test_rollups_partition_the_corpus(spark, docs):
    card = corpus_card(docs)
    n = docs.count()
    for roll in (card.by_source, card.by_lang):
        rows = roll.collect()
        assert sum(r["n_docs"] for r in rows) == n
        assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=0.01)
    hist = card.token_histogram.collect()
    assert sum(r["n"] for r in hist) == n  # token counts are never null
    # the two cards of a funnel: a deduped corpus reports fewer docs but
    # the same distinct-text count (the dedup story in numbers)
    from pyspark.sql import functions as F

    from knightshift_spark.functions.text import doc_fingerprint

    before = card.overview.collect()[0]
    keep = docs.groupBy(doc_fingerprint(F.col("text")).alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = corpus_card(docs.join(keep.select("doc_id"), "doc_id", "left_semi"))
    after = deduped.overview.collect()[0]
    assert after["n_distinct_texts"] == before["n_distinct_texts"]
    assert after["n_docs"] == before["n_distinct_texts"]


def test_source_col_optional(spark, docs):
    card = corpus_card(docs.drop("source"), source_col=None)
    assert card.by_source is None
    assert card.overview.collect()[0]["n_docs"] == docs.count()


def test_corpus_diff_statuses(spark):
    from knightshift_spark.operators.profiling import (
        corpus_diff,
        corpus_diff_summary,
    )

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "GAMMA edited"), (4, "delta")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    summary = {r["status"]: r["n"] for r in corpus_diff_summary(old, new).collect()}
    assert summary == {"added": 1, "changed": 1, "removed": 1, "unchanged": 1}
