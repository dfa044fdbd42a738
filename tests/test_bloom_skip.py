"""Bloom-filter data skipping (r13 — Delta's bloom-filter-index shape).

Per-file bloom bitmaps for declared ``bloom_cols`` ride the commit log
(computed executor-side in one pass over the written bytes) and
``snapshot_eq`` prunes files whose value set cannot contain a point
probe — the skipping class footer min/max cannot give on an unsorted
high-cardinality column. Skipping is advisory: surviving files are
re-filtered exactly, so correctness never depends on the bloom."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knightshift_spark.sources.txntable import TxnTable

SCHEMA = "id long, tag string, version int"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _mk(spark, tmp_path, **kw):
    return TxnTable.create(
        spark, str(tmp_path / "t"), keys=["id"], schema=SCHEMA, n_buckets=4,
        bloom_cols=["tag"], **kw,
    )


def test_point_probe_prunes_files_and_stays_exact(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # four appends, each with a disjoint tag universe: a point probe
    # should open only the files of the append that wrote the tag
    for g in range(4):
        t.append(_df(spark, [
            (g * 100 + i, f"tag-{g}-{i % 7}", 1) for i in range(40)
        ]))
    all_paths = [p for p, _ in t._state()[1].items()]
    probe = t._paths_for_eq("tag", "tag-2-3")
    assert len(probe) < len(all_paths), (len(probe), len(all_paths))
    got = {(r.id, r.tag) for r in t.snapshot_eq("tag", "tag-2-3").collect()}
    want = {
        (r.id, r.tag)
        for r in t.snapshot().filter(F.col("tag") == "tag-2-3").collect()
    }
    assert got == want and got  # exact AND non-empty
    # an absent value prunes EVERYTHING (no false negatives required,
    # but with disjoint universes the bloom should kill all files)
    assert t.snapshot_eq("tag", "no-such-tag").count() == 0


def test_no_false_negatives_across_rewrites(spark, tmp_path):
    """merge/delete/compact/rebucket rewrites recompute blooms via the
    shared write path: every live value stays findable through every
    mutation, at every retained version."""
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(i, f"a{i}", 1) for i in range(30)]))
    t.merge(_df(spark, [(5, "b5", 2), (99, "b99", 1)]), ["version"])
    t.delete_where(F.col("id") % 11 == 3, rewrite_all=True)
    t.compact()
    t.rebucket(8)
    t.update_where(F.col("id") == 7, {"tag": F.lit("u7")})
    for v in range(1, t.version() + 1):
        live = {
            (r.id, r.tag)
            for r in t.snapshot(v).collect()
        }
        for i, tag in sorted(live)[:10]:  # probe a sample per version
            got = {
                (r.id, r.tag)
                for r in t.snapshot_eq("tag", tag, version=v).collect()
            }
            assert (i, tag) in got, (v, i, tag)


def test_non_bloom_column_and_integer_probe(spark, tmp_path):
    """A probe on a column without a bloom falls back to stats-only
    pruning but stays exact; integer bloom columns canonicalize
    identically on both sides."""
    t = TxnTable.create(
        spark, str(tmp_path / "t2"), keys=["id"], schema=SCHEMA,
        n_buckets=4, bloom_cols=["id", "tag"],
    )
    t.append(_df(spark, [(i, f"x{i % 3}", i % 5) for i in range(50)]))
    # integer probe through the bloom
    got = {r.id for r in t.snapshot_eq("id", 17).collect()}
    assert got == {17}
    # version has no bloom: stats-only path, still exact
    got = {r.id for r in t.snapshot_eq("version", 2).collect()}
    assert got == {i for i in range(50) if i % 5 == 2}


def test_create_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="not in the table schema"):
        TxnTable.create(
            spark, str(tmp_path / "a"), keys=["id"], schema=SCHEMA,
            n_buckets=2, bloom_cols=["nope"],
        )
    with pytest.raises(ValueError, match="string/integer"):
        TxnTable.create(
            spark, str(tmp_path / "b"), keys=["id"],
            schema="id long, x double", n_buckets=2, bloom_cols=["x"],
        )
    with pytest.raises(ValueError, match="bloom_bits"):
        TxnTable.create(
            spark, str(tmp_path / "c"), keys=["id"], schema=SCHEMA,
            n_buckets=2, bloom_cols=["tag"], bloom_bits=100,
        )
    t = TxnTable.create(
        spark, str(tmp_path / "d"), keys=["id"], schema=SCHEMA,
        n_buckets=2, bloom_cols=["tag"],
    )
    t.append(_df(spark, [(1, "a", 1)]))
    with pytest.raises(ValueError, match="IS NULL"):
        t.snapshot_eq("tag", None)
