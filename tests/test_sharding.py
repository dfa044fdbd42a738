"""Training-shard writer (operators.sharding).

Pins: partition of the corpus (every doc in exactly one shard), token
balance within one document of the budget, determinism + salt redraw,
manifest/summary agreement, verify_shards catching drift, empty input.
"""

import pyspark.sql.functions as F
import pytest

from knightshift_spark.operators.sharding import (
    assign_shards,
    verify_shards,
    write_training_shards,
)


def _docs(spark, n=200, tmax=40):
    # deterministic token counts, mixed sizes
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % tmax + 1).cast("int").alias("n_tokens"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_shards_partition_the_corpus_and_respect_budget(spark):
    docs = _docs(spark)
    budget = 100
    a = assign_shards(docs, budget)
    rows = a.collect()
    assert {r["doc_id"] for r in rows} == set(range(200))  # exactly once
    per = {}
    for r in rows:
        per.setdefault(r["shard"], []).append(r["n_tokens"])
    total = sum(r["n_tokens"] for r in rows)
    assert sorted(per) == list(range(len(per)))  # dense shard ids 0..K-1
    # shard s covers token span [s*budget, (s+1)*budget): a shard's sum
    # can only exceed the budget by the straddling document's tail and
    # undershoot only at the final shard
    max_doc = max(r["n_tokens"] for r in rows)
    for s, toks in per.items():
        assert sum(toks) <= budget + max_doc
        if s != max(per):
            assert sum(toks) >= budget - max_doc


def test_deterministic_and_salt_redeals(spark):
    docs = _docs(spark)
    a1 = {(r["doc_id"], r["shard"]) for r in assign_shards(docs, 100).collect()}
    a2 = {(r["doc_id"], r["shard"]) for r in assign_shards(docs, 100).collect()}
    assert a1 == a2
    b = {(r["doc_id"], r["shard"]) for r in assign_shards(docs, 100, salt="v2").collect()}
    assert a1 != b  # the permutation re-dealt
    assert {d for d, _ in b} == {d for d, _ in a1}  # still a partition


def test_write_manifest_and_verify_roundtrip(spark, tmp_path):
    docs = _docs(spark, n=120)
    path = str(tmp_path / "shards")
    summary = write_training_shards(docs, path, shard_tokens=150)
    assert summary["n_docs"] == 120
    assert summary["n_tokens"] == sum(
        r["n_tokens"] for r in docs.select("n_tokens").collect()
    )
    data = spark.read.parquet(f"{path}/data")
    assert data.count() == 120
    assert set(data.columns) >= {"doc_id", "n_tokens", "text", "shard"}
    # clean verify: no drift
    assert verify_shards(spark, path).count() == 0


def test_verify_detects_mutation(spark, tmp_path):
    import glob
    import os

    docs = _docs(spark, n=80)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, shard_tokens=200)
    # drop one data file from one shard: doc count / checksum drift
    victims = sorted(glob.glob(f"{path}/data/shard=*/part-*.parquet"))
    os.remove(victims[0])
    bad = verify_shards(spark, path)
    assert bad.count() > 0
    fields = {r["field"] for r in bad.collect()}
    assert "checksum" in fields or "n_docs" in fields


def test_empty_input(spark, tmp_path):
    docs = _docs(spark).filter(F.col("doc_id") < 0)
    path = str(tmp_path / "shards")
    summary = write_training_shards(docs, path, shard_tokens=100)
    assert summary["n_docs"] == 0 and summary["n_shards"] == 0
    assert verify_shards(spark, path).count() == 0


def test_bad_budget_raises(spark):
    with pytest.raises(ValueError):
        assign_shards(_docs(spark), 0)


def test_assignment_invariant_to_physical_partitioning(spark):
    """The two-phase prefix sum keys on the logical order only: the same
    corpus arriving in different physical layouts (partition counts,
    orders) must shard identically — reshuffling inputs is routine at
    ingest and must never move shard boundaries."""
    docs = _docs(spark, n=150)
    base = {(r["doc_id"], r["shard"]) for r in assign_shards(docs, 120).collect()}
    for layout in (docs.repartition(7), docs.repartition(1),
                   docs.orderBy(F.col("doc_id").desc())):
        got = {(r["doc_id"], r["shard"]) for r in assign_shards(layout, 120).collect()}
        assert got == base


def test_writer_evaluates_input_plan_exactly_once(spark, tmp_path):
    """VERDICT r9 #5: the shard writer must run ONE pass over the input
    plan — data write and manifest read the materialized blocks, not the
    plan. Counted directly: a Python UDF in the input plan increments an
    accumulator per row; after the write the count equals the row count
    exactly (a second evaluation would double it)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from knightshift_spark.operators.sharding import write_training_shards

    acc = spark.sparkContext.accumulator(0)

    @F.udf(returnType=LongType())
    def counted(v):
        acc.add(1)
        return v

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"), counted(F.col("id") % 7 + 1).alias("n_tokens")
    )
    summary = write_training_shards(docs, str(tmp_path / "s"), shard_tokens=20)
    assert summary["n_docs"] == 50
    assert acc.value == 50, f"input plan evaluated {acc.value / 50:.1f}x"


def test_footer_reconcile_modes_agree_and_auto_probes(tmp_path, monkeypatch):
    """VERDICT r10 #3: serial / pooled / auto footer reads return the
    same counts; auto's latency probe stays serial on sub-ms local
    reads and switches to the pool when per-file latency says I/O-bound
    (object-store regime, simulated with a slowed reader)."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from knightshift_spark.operators import sharding

    root = tmp_path / "codes"
    root.mkdir()
    for s in range(40):
        d = root / f"shard={s}"
        d.mkdir()
        pq.write_table(pa.table({"x": list(range(s % 5))}), str(d / "p.parquet"))
    expect = {s: s % 5 for s in range(40)}
    assert sharding._footer_doc_counts(str(root), mode="serial") == expect
    assert sharding._footer_doc_counts(str(root), mode="pool") == expect
    assert sharding._footer_doc_counts(str(root)) == expect
    with pytest.raises(ValueError, match="mode"):
        sharding._footer_doc_counts(str(root), mode="bogus")

    calls = {"pooled": 0}
    real_pf = pq.ParquetFile

    class SlowPF:
        def __init__(self, path):
            time.sleep(0.004)  # object-store-ish footer latency
            self._pf = real_pf(path)

        @property
        def metadata(self):
            return self._pf.metadata

    from concurrent import futures

    class SpyPool(futures.ThreadPoolExecutor):
        def __init__(self, *a, **k):
            calls["pooled"] += 1
            super().__init__(*a, **k)

    monkeypatch.setattr(pq, "ParquetFile", SlowPF)
    monkeypatch.setattr(futures, "ThreadPoolExecutor", SpyPool)
    monkeypatch.setattr(
        "concurrent.futures.ThreadPoolExecutor", SpyPool
    )
    got = sharding._footer_doc_counts(str(root))
    assert got == expect
    assert calls["pooled"] == 1  # the probe measured >2ms and pooled
