"""Mixture planner: water-filling math vs hand-computed plans, cap
release, deterministic application with epoch labeling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knightshift_spark.operators.mixture import (
    apply_mixture_plan,
    mixture_plan,
    source_token_counts,
)


def _corpus(spark):
    # source a: 4 docs × 10 tokens = 40; source b: 2 docs × 10 = 20
    rows = [(i, " ".join(["w"] * 10), "a") for i in range(4)] + [
        (10 + i, " ".join(["w"] * 10), "b") for i in range(2)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_counts_ignore_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "s"), (2, None, "s")], "doc_id long, text string, source string"
    )
    got = source_token_counts(docs).collect()[0]
    assert (got["n_docs"], got["n_tokens"]) == (2, 3)  # null text = 0 tokens


def test_counts_and_uncapped_plan(spark):
    docs = _corpus(spark)
    counts = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in source_token_counts(docs).collect()
    }
    assert counts == {"a": (4, 40), "b": (2, 20)}
    # budget 30, weights 2:1 → a gets 20 (0.5 epochs), b gets 10 (0.5)
    plan = {p["source"]: p for p in mixture_plan(docs, {"a": 2.0, "b": 1.0}, 30)}
    assert plan["a"]["epochs"] == pytest.approx(0.5)
    assert plan["b"]["epochs"] == pytest.approx(0.5)
    assert plan["a"]["target_tokens"] + plan["b"]["target_tokens"] == 30


def test_cap_releases_budget_to_the_rest(spark):
    docs = _corpus(spark)
    # budget 100, weights equal → naive split 50/50 would put b at 2.5
    # epochs; cap 2.0 → b takes 40, the released 10 flow to a → a = 60/40
    plan = {
        p["source"]: p
        for p in mixture_plan(docs, {"a": 1.0, "b": 1.0}, 100, max_epochs=2.0)
    }
    assert plan["b"]["epochs"] == pytest.approx(2.0)
    assert plan["a"]["epochs"] == pytest.approx(1.5)
    assert sum(p["target_tokens"] for p in plan.values()) == 100


def test_all_sources_capped_shows_shortfall(spark):
    docs = _corpus(spark)
    plan = mixture_plan(docs, {"a": 1.0, "b": 1.0}, 10_000, max_epochs=2.0)
    assert all(p["epochs"] == 2.0 for p in plan)
    assert sum(p["target_tokens"] for p in plan) == 120  # visible shortfall


def test_guards(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="total_tokens"):
        mixture_plan(docs, {"a": 1.0}, 0)
    with pytest.raises(ValueError, match="negative"):
        mixture_plan(docs, {"a": -1.0}, 10)
    with pytest.raises(ValueError, match="absent"):
        mixture_plan(docs, {"nope": 1.0}, 10)


def test_apply_plan_replicates_and_samples_deterministically(spark):
    a_ids = set(range(40))
    rows = [(i, "w w w", "a") for i in a_ids] + [
        (100, "w w w", "b"), (101, "w w w", "b")
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = [
        {"source": "a", "epochs": 2.5},  # 2 full copies + half sample
        {"source": "b", "epochs": 1.0},  # exactly one copy
    ]
    out1 = apply_mixture_plan(docs, plan).collect()
    out2 = apply_mixture_plan(docs, plan).collect()
    key = lambda r: (r["doc_id"], r["epoch"])
    assert sorted(map(key, out1)) == sorted(map(key, out2))
    by_epoch = {}
    for r in out1:
        by_epoch.setdefault((r["source"], r["epoch"]), set()).add(r["doc_id"])
    assert by_epoch[("a", 1)] == a_ids
    assert by_epoch[("a", 2)] == a_ids
    frac = by_epoch.get(("a", 3), set())
    assert frac < a_ids and 5 <= len(frac) <= 35  # ~half, md5-fixed
    assert by_epoch[("b", 1)] == {100, 101}
    assert ("b", 2) not in by_epoch
