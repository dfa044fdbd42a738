"""C4 cleaning rules vs a DuckDB oracle + pinned fixtures."""

from __future__ import annotations

import duckdb
import pytest

from knightshift_spark.operators.c4filters import (
    c4_clean,
    c4_doc_filter,
    c4_line_filter,
)

DOCS = [
    # good prose page: all lines survive
    (1, "This is a fine first sentence.\nAnd here is another good line!\n"
        'A third line ends with a quote."'),
    # mixed: menu fragments and a js line drop, prose stays
    (2, "Home | About | Contact\nEnable JavaScript to view this site.\n"
        "The actual article text is right here, and it is long enough."),
    # too short lines only -> doc drops out of line filter entirely
    (3, "Menu\nLogin\nSearch"),
    # page-level fails: lorem ipsum
    (4, "Lorem ipsum dolor sit amet, consectetur adipiscing elit sed do.\n"
        "Another full sentence follows here to pad the page out properly.\n"
        "And a third one, so the sentence count is not the failure."),
    # page-level fails: curly braces (code)
    (5, "This page explains the function below in plain words, honestly.\n"
        "Then it shows code like function() { return 1; } which disqualifies.\n"
        "A third sentence keeps the sentence count safely above the bar."),
    # too few sentences after cleaning
    (6, "Just one single sentence lives on this page after cleaning."),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_line_filter_matches_duckdb(docs):
    got = {r["doc_id"]: r["text"] for r in c4_line_filter(docs).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    want = dict(
        con.execute(
            r"""
        WITH p0 AS (
          SELECT doc_id, string_split(text, chr(10)) AS parts FROM d),
        lines AS (
          SELECT doc_id, CAST(j AS INT) AS pos,
                 parts[CAST(j + 1 AS INT)] AS line
          FROM p0, unnest(range(0, len(parts))) AS u(j)),
        ok AS (
          SELECT doc_id, pos, line FROM lines
          WHERE regexp_matches(trim(line), '[.!?"]$')
            AND len(string_split_regex(trim(line), '\s+')) >= 5
            AND NOT contains(lower(trim(line)), 'javascript'))
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) FROM ok GROUP BY doc_id"""
        ).fetchall()
    )
    assert got == want
    assert 3 not in got                      # all lines failed -> doc gone
    assert got[2].startswith("The actual article")  # chrome lines dropped
    assert got[1] == DOCS[0][1]              # clean page untouched


def test_doc_rules(docs):
    kept = {r["doc_id"] for r in c4_doc_filter(docs).collect()}
    assert 4 not in kept   # lorem ipsum
    assert 5 not in kept   # curly brace
    assert 6 not in kept   # one sentence
    # doc 2's RAW text holds only two sentences (chrome lines aren't
    # prose), so the page rule drops it here; only doc 1 passes raw
    assert kept == {1}


def test_c4_clean_composition(docs):
    out = {r["doc_id"]: r["text"] for r in c4_clean(docs).collect()}
    # 1 survives intact; 2 survives cleaned BUT has only 1 sentence left
    # after line cleaning -> fails min_sentences; 3/4/6 drop; 5: the code
    # line is dropped by the LINE filter (no terminal punct)... it ends
    # with '.' actually, but contains '{' -> page rule fires after
    assert 1 in out
    assert 3 not in out and 4 not in out and 6 not in out
    for text in out.values():
        assert "javascript" not in text.lower()


def test_other_columns_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, "A good line that is long enough to pass easily.", "web")],
        "doc_id long, text string, source string",
    )
    out = c4_line_filter(docs).collect()
    assert out[0]["source"] == "web"
    assert set(out[0].asDict()) == {"doc_id", "text", "source"}
