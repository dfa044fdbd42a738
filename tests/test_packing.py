"""Sequence-packing operators vs straight-Python references.

Both packers are deterministic functions of (ordering key, token counts,
budget); the references replay the same walk serially.  Bucket-count
invariance is the load-bearing assertion for ``chunk_pack`` — the
two-phase prefix sum must give byte-identical spans no matter how the
rows were bucketed.
"""

from __future__ import annotations

import pytest

from knightshift_spark.operators.packing import chunk_pack, greedy_pack, pack_stats

# (doc_id, n_tokens) — mixes tiny docs, a budget-straddler, a zero-token
# doc, and one larger than the budget (217 > 128)
DOCS = [
    (1, 40), (2, 90), (3, 17), (4, 0), (5, 128), (6, 5),
    (7, 217), (8, 64), (9, 64), (10, 1), (11, 33), (12, 100),
]
BUDGET = 128


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, n_tokens bigint")


def _chunk_reference():
    """Serial concat-and-split walk."""
    out, start = {}, 0
    for doc_id, n in sorted(DOCS):
        end_incl = start + max(n - 1, 0)
        first, last = start // BUDGET, end_incl // BUDGET
        out[doc_id] = (start, first, last, last - first + 1)
        start += n
    return out


def _greedy_reference(order, budget):
    """Serial first-fit walk over one bucket."""
    packs, pack, pos, used = {}, 0, 0, 0
    for doc_id, n in order:
        if used > 0 and used + n > budget:
            pack, pos, used = pack + 1, 0, 0
        packs[doc_id] = (pack, pos)
        used += n
        pos += 1
    return packs


@pytest.mark.parametrize("n_buckets", [1, 3, 256])
def test_chunk_pack_matches_serial_reference(spark, n_buckets):
    # force the two-phase branch: the adaptive gate (r10) would pick the
    # single-window plan at this size and ignore n_buckets entirely
    got = {
        r.doc_id: (r.tok_start, r.chunk_first, r.chunk_last, r.n_chunks_spanned)
        for r in chunk_pack(
            _docs_df(spark), BUDGET, n_buckets=n_buckets, mode="two_phase"
        ).collect()
    }
    assert got == _chunk_reference()


def test_chunk_pack_straddler_spans_multiple(spark):
    spans = {
        r.doc_id: r.n_chunks_spanned
        for r in chunk_pack(_docs_df(spark), BUDGET).collect()
    }
    assert spans[7] >= 2  # 217-token doc must cross at least one cut
    assert spans[4] == 1  # zero-token doc occupies its offset's chunk


def test_greedy_pack_single_bucket_matches_reference(spark):
    got = {
        r.doc_id: (r.pack_id, r.pack_pos)
        for r in greedy_pack(_docs_df(spark), BUDGET, n_buckets=1).collect()
    }
    ref = _greedy_reference(sorted(DOCS), BUDGET)
    assert {d: v for d, (v, _) in ref.items()} == {d: p for d, (p, _) in got.items()}
    assert {d: v for d, (_, v) in ref.items()} == {d: p for d, (_, p) in got.items()}


def test_greedy_pack_respects_budget_any_bucketing(spark):
    for n_buckets in (1, 4, 256):
        packed = greedy_pack(_docs_df(spark), BUDGET, n_buckets=n_buckets)
        fills = (
            packed.groupBy("pack_id").sum("n_tokens").toPandas()["sum(n_tokens)"]
        )
        # every pack fits the budget except the oversize doc's singleton
        assert sorted(f for f in fills if f > BUDGET) == [217]
        # every doc appears exactly once
        assert packed.count() == len(DOCS)


def test_pack_stats_shape(spark):
    stats = pack_stats(greedy_pack(_docs_df(spark), BUDGET, n_buckets=1), BUDGET)
    row = stats.collect()[0]
    assert row.n_packs > 0 and 0.0 < row.mean_fill <= 1.7  # singleton 217/128 caps it
    assert row.mean_docs_per_pack >= 1.0


def test_chunk_pack_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id bigint, n_tokens bigint")
    assert chunk_pack(empty, BUDGET).count() == 0
    assert greedy_pack(empty, BUDGET).count() == 0


def test_greedy_pack_matches_duckdb_recursive_cte(spark):
    """Cross-ENGINE oracle for the first-fit walk (not just a Python
    replay): DuckDB reproduces the per-bucket sequential pack state with
    a recursive CTE. greedy_pack's only scale concession — packs never
    cross range buckets — is encoded identically on both sides."""
    import duckdb

    n_buckets = 3
    df = _docs_df(spark)
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_pos"])
        for r in greedy_pack(df, BUDGET, n_buckets=n_buckets).collect()
    }

    lo, hi = 1, 12  # doc_id span of DOCS
    span = hi - lo + 1
    rows = ", ".join(f"({d}, {n})" for d, n in DOCS)
    sql = f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, n_tokens,
             CAST(floor((doc_id - {lo}) * {n_buckets} / {span}) AS INT) AS bkt
      FROM (VALUES {rows}) AS v(doc_id, n_tokens)),
    ordered AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY doc_id) AS rn
      FROM t),
    walk AS (
      SELECT bkt, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS pack, 0 AS pos, n_tokens AS used
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.bkt, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN w.used > 0 AND w.used + o.n_tokens > {BUDGET}
                  THEN w.pack + 1 ELSE w.pack END,
             CASE WHEN w.used > 0 AND w.used + o.n_tokens > {BUDGET}
                  THEN 0 ELSE w.pos + 1 END,
             CASE WHEN w.used > 0 AND w.used + o.n_tokens > {BUDGET}
                  THEN o.n_tokens ELSE w.used + o.n_tokens END
      FROM walk w JOIN ordered o ON o.bkt = w.bkt AND o.rn = w.rn + 1)
    SELECT doc_id, (CAST(bkt AS BIGINT) << 32) + pack AS pack_id, pos
    FROM walk
    """
    want = {d: (p, q) for d, p, q in duckdb.connect().execute(sql).fetchall()}
    assert got == want


def test_sliding_windows_matches_bruteforce_oracle(spark):
    """Random doc lengths vs a serial python oracle: every document's
    window range under (window=16, stride=8) overlap packing."""
    import random

    from knightshift_spark.operators.packing import sliding_windows

    rng = random.Random(3)
    rows = [(i, rng.choice([0, 1, 3, 7, 16, 31])) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["tok_start"], r["win_first"], r["win_last"], r["n_windows"])
        for r in sliding_windows(docs, window=16, stride=8, n_buckets=7).collect()
    }
    start = 0
    for doc_id, n in rows:
        end = start + max(n - 1, 0)
        w_last = end // 8
        # zero-token docs clamp to the one window starting at-or-before
        # their offset (ADVICE r6: span-1 contract for stride < window)
        w_first = w_last if n == 0 else max(0, -((start - 16 + 1) // -8))
        assert got[doc_id] == (start, w_first, w_last, w_last - w_first + 1), doc_id
        start += n


def test_sliding_windows_stride_equals_window_is_chunk_pack(spark):
    import random

    from knightshift_spark.operators.packing import chunk_pack, sliding_windows

    rng = random.Random(9)
    docs = spark.createDataFrame(
        [(i, rng.randint(0, 40)) for i in range(150)], "doc_id long, n_tokens long"
    )
    chunks = {
        r["doc_id"]: (r["tok_start"], r["chunk_first"], r["chunk_last"])
        for r in chunk_pack(docs, budget=32).collect()
    }
    wins = {
        r["doc_id"]: (r["tok_start"], r["win_first"], r["win_last"])
        for r in sliding_windows(docs, window=32).collect()
    }
    assert chunks == wins


def test_sliding_windows_rejects_gappy_stride(spark):
    import pytest

    from knightshift_spark.operators.packing import sliding_windows

    docs = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="gap"):
        sliding_windows(docs, window=8, stride=9)
    with pytest.raises(ValueError, match=">= 1"):
        sliding_windows(docs, window=0)


def test_chunk_pack_single_and_auto_match_two_phase(spark):
    """VERDICT r9 #4: all three prefix-sum modes produce the identical
    packing; auto picks the single-window plan at this size (no bucket
    exchange in its physical plan)."""
    from knightshift_spark.plans.partitioning import explain_str

    def rows(mode):
        return {
            r.doc_id: (r.tok_start, r.chunk_first, r.chunk_last, r.n_chunks_spanned)
            for r in chunk_pack(_docs_df(spark), BUDGET, mode=mode).collect()
        }

    assert rows("single") == rows("two_phase") == rows("auto") == _chunk_reference()
    # driver-local DataFrames report UNKNOWN plan size (Long.Max), so
    # auto stays on the scale-safe two-phase branch there; a parquet
    # scan has a real estimate and flips to the single-window plan
    assert "hashpartitioning(__bkt" in explain_str(
        chunk_pack(_docs_df(spark), BUDGET, mode="auto")
    )
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    pq_docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", F.length("text").alias("n_tokens"))
    )
    assert "hashpartitioning(__bkt" not in explain_str(
        chunk_pack(pq_docs, BUDGET, mode="auto")
    )
