"""PII redaction: cross-engine exactness, ordering, idempotence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from knightshift_spark.operators.redact import (
    PII_PATTERNS,
    pii_stats,
    redact_pii,
)

DOCS = [
    (1, "contact Jane.Doe+spam@example.co.uk or call +1 (555) 123-4567 now"),
    (2, "server 192.168.1.254 logged ssn 123-45-6789 and card 4111 1111 1111 1111"),
    (3, "plain text with no identifiers at all, just words and 42 numbers"),
    (4, "double jane@x.io jane@x.io and ip 10.0.0.1 10.0.0.2"),
    (5, ""),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_redaction_matches_duckdb_oracle(docs):
    got = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    expr = "text"
    for name, rx in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{rx}', '<{name}>', 'g')"
    for doc_id, want in con.execute(f"SELECT doc_id, {expr} FROM d").fetchall():
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_category_markers_and_ordering(docs):
    out = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert "<EMAIL>" in out[1] and "<PHONE>" in out[1]
    assert "Jane.Doe" not in out[1]
    # the 16-digit card is ONE <CARD>, not a run of phone fragments
    assert out[2].count("<CARD>") == 1 and "<PHONE>" not in out[2]
    assert "<IPV4>" in out[2] and "<SSN>" in out[2]
    assert out[3] == DOCS[2][1]  # untouched
    assert out[4].count("<EMAIL>") == 2 and out[4].count("<IPV4>") == 2


def test_idempotent(docs):
    once = redact_pii(docs)
    twice = redact_pii(once)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_out_col_keeps_original(docs):
    out = redact_pii(docs, out_col="clean").filter(F.col("doc_id") == 1).collect()[0]
    assert "Jane.Doe" in out["text"] and "<EMAIL>" in out["clean"]


def test_pii_stats_counts_match_markers(docs):
    stats = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    redacted = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    for doc_id, text in redacted.items():
        n_markers = sum(text.count(f"<{n}>") for n in PII_PATTERNS)
        assert stats[doc_id]["n_pii_total"] == n_markers, doc_id
    assert stats[1]["n_email"] == 1 and stats[1]["n_phone"] == 1
    assert stats[2]["n_card"] == 1 and stats[2]["n_ssn"] == 1
    assert stats[3]["n_pii_total"] == 0 and stats[5]["n_pii_total"] == 0


def test_plan_stays_jvm_side(docs):
    from knightshift_spark.plans.partitioning import explain_str

    plan = explain_str(redact_pii(docs)) + explain_str(pii_stats(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
