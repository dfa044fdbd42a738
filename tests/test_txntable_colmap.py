"""Column mapping (r14, VERDICT r13 item 3 — Delta's shape): RENAME and
DROP as metadata-only commits. Physical file names never change, so no
data moves; time travel replays each version's own mapping; CDC/SCD2
present a rename-spanning history under one uniform set of names.

Reference anchor: the reference's ``schemas/CHANGELOG.md`` documents
``is_valid``→``ind_validated``-style renames that its row-at-a-time
ETL cannot replay — here they are first-class, conflict-checked
commits.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from knightshift_spark.sources.txntable import (
    ConcurrentWriteError,
    SchemaMismatchError,
    TxnTable,
)

SCHEMA = "id long, val string, version int"


def _df(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable.create(
        spark, str(tmp_path / "t"), keys=["id"], schema=SCHEMA, n_buckets=4
    )
    t.append(_df(spark, [(i, f"v{i}", 1) for i in range(10)]))
    return t


def _data_roots(table):
    return sorted(os.listdir(os.path.join(table.path, "data")))


def test_rename_is_metadata_only_and_round_trips(spark, table):
    roots0 = _data_roots(table)
    v = table.rename_column("val", "label")
    assert _data_roots(table) == roots0  # no data moved
    got = table.snapshot()
    assert "label" in got.columns and "val" not in got.columns
    assert {r.label for r in got.collect()} == {f"v{i}" for i in range(10)}
    # old snapshots read under their era's name
    old = table.snapshot(v - 1)
    assert "val" in old.columns and "label" not in old.columns
    # mutate THROUGH the rename: new writes use the new logical name
    table.merge(
        _df(spark, [(3, "renamed3", 2)], "id long, label string, version int"),
        ["version"],
    )
    got = {r.id: r.label for r in table.snapshot().collect()}
    assert got[3] == "renamed3" and got[4] == "v4"
    # rename back: the physical name still never changes
    table.rename_column("label", "val")
    assert {r.val for r in table.snapshot().filter(F.col("id") == 3).collect()} == {
        "renamed3"
    }


def test_rename_follows_keys_stats_and_pruning(spark, tmp_path):
    t = TxnTable.create(
        spark,
        str(tmp_path / "k"),
        keys=["id"],
        schema="id long, ts long, val string",
        n_buckets=4,
        stats_cols=["id", "ts"],
        bloom_cols=["val"],
    )
    t.append(_df(spark, [(i, i * 10, f"v{i}") for i in range(40)],
                 "id long, ts long, val string"))
    n_all = len(t._state()[1])
    t.rename_column("ts", "event_ts")
    t.rename_column("id", "pk")
    meta = t._state()[0]
    assert meta["keys"] == ["pk"]
    assert meta["stats_cols"] == ["pk", "event_ts"]
    # stats-pruned reads still skip files under the NEW logical name:
    # an out-of-range probe prunes EVERYTHING — if the lookup failed to
    # translate to the stable physical key, missing stats would read as
    # "must open" (never-wrong rule) and all entries would come back
    assert n_all > 0
    assert len(t._items_for_range("event_ts", -100, -1)) == 0
    assert t.snapshot_where("event_ts", 0, 50).count() == 6
    assert t.snapshot_eq("pk", 7).count() == 1
    # bloom probing under the renamed value column
    t.rename_column("val", "label")
    assert t.snapshot_eq("label", "v7").count() == 1
    # merge keyed on the renamed key column
    t.merge(
        _df(spark, [(7, 999, "u7")], "pk long, event_ts long, label string"),
        ["event_ts"],
    )
    assert {r.label for r in t.lookup([7]).collect()} == {"u7"}


def test_drop_column_hides_everywhere_and_refuses_reuse(spark, table):
    roots0 = _data_roots(table)
    table.drop_column("version")
    assert _data_roots(table) == roots0
    got = table.snapshot()
    assert set(got.columns) == {"id", "val"}
    # evolution may NOT reuse the retired physical name (old bytes
    # would resurrect); a fresh name works
    with pytest.raises(SchemaMismatchError, match="resurrect"):
        table.merge(
            _df(spark, [(1, "x", 5)], "id long, val string, version int"),
            ["val"],
            evolve=True,
        )
    table.merge(
        _df(spark, [(1, "x", 5)], "id long, val string, rev int"),
        ["val"],
        evolve=True,
    )
    got = {r.id: (r.val, r.rev) for r in table.snapshot().collect()}
    assert got[1] == ("x", 5) and got[2] == ("v2", None)
    # time travel still shows the dropped column at old versions
    assert "version" in table.snapshot(1).columns


def test_drop_refuses_keys_and_constraint_refs(spark, tmp_path):
    t = TxnTable.create(
        spark,
        str(tmp_path / "c"),
        keys=["id"],
        schema=SCHEMA,
        n_buckets=2,
        constraints={"pos": "version > 0"},
    )
    t.append(_df(spark, [(1, "a", 1)]))
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("id")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("version")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("version", "rev")
    t.drop_constraint("pos")
    t.rename_column("version", "rev")
    assert "rev" in t.snapshot().columns


def test_rename_preserves_cdc_scd2_and_dv_history(spark, tmp_path):
    """The VERDICT done-bar: mutate → rename → mutate; scd2_history and
    table_changes read consistently under ONE set of names; old
    snapshots still read; DV masks keep applying through the rename."""
    t = TxnTable.create(
        spark, str(tmp_path / "h"), keys=["id"], schema=SCHEMA,
        n_buckets=4, deletion_vectors=True,
    )
    t.append(_df(spark, [(i, f"v{i}", 1) for i in range(8)]))
    t.merge(_df(spark, [(2, "u2", 2)]), ["version"])
    t.delete_where(F.col("id") == 5)              # DV mask pre-rename
    v_ren = t.rename_column("val", "label")
    t.merge(
        _df(spark, [(3, "u3", 3)], "id long, label string, version int"),
        ["version"],
    )
    t.delete_where(F.col("id") == 7)              # DV mask post-rename
    # DV masks still apply (file-key based, name-independent)
    ids = {r.id for r in t.snapshot().collect()}
    assert 5 not in ids and 7 not in ids
    # row-level CDC: feeds for PRE-rename commits read under the NEW
    # name — a rename-spanning consumer sees one uniform schema
    rc = t.row_changes(2)  # the pre-rename merge
    assert "label" in rc.columns and "val" not in rc.columns
    assert {r.label for r in rc.filter(
        F.col("_change_type") == "update_postimage").collect()} == {"u2"}
    # file-granular feed across the rename boundary
    tc = t.table_changes(0)
    assert "label" in tc.columns
    assert tc.filter(F.col("_commit_version") > v_ren).count() > 0
    # SCD2 history spans the rename with one schema and exact spans
    hist = t.scd2_history()
    assert "label" in hist.columns and "val" not in hist.columns
    spans = {
        (r["id"], r["label"], r["__valid_from"], r["__valid_to"])
        for r in hist.collect()
    }
    assert (2, "v2", 1, 2) in spans and (2, "u2", 2, None) in spans
    assert (3, "u3", v_ren + 1, None) in spans
    # validity-filter invariant holds for EVERY retained version
    for v in range(1, t.version() + 1):
        live = hist.filter(
            (F.col("__valid_from") <= v)
            & (F.col("__valid_to").isNull() | (F.col("__valid_to") > v))
        )
        snap = t.snapshot(v)
        want = {
            (r.id, r[1], r.version) for r in snap.collect()
        }
        gotv = {(r.id, r.label, r.version) for r in live.collect()}
        assert gotv == want, f"version {v}"


def test_rename_conflicts_with_concurrent_writers_both_ways(spark, table):
    t2 = TxnTable(table.spark, table.path)
    meta, active, read_v = t2._state()
    table.rename_column("val", "label")  # interloper schema change
    with pytest.raises(ConcurrentWriteError, match="schema"):
        t2.merge(
            _df(spark, [(1, "x", 9)]), ["version"],
            _state_hint=(meta, active, read_v),
        )
    # and the other direction: a data commit lands between the rename's
    # read and publish -> the rename loses
    t3 = TxnTable(table.spark, table.path)
    meta3 = t3._state()
    table.append(
        _df(spark, [(100, "r", 1)], "id long, label string, version int")
    )
    orig_state = t3._state

    def stale_state(version=None):
        if version is None:
            return meta3
        return orig_state(version)

    t3._state = stale_state
    with pytest.raises(ConcurrentWriteError):
        t3.rename_column("label", "v2name")


def test_colmap_survives_checkpoint_compact_and_restore(spark, table):
    table.rename_column("val", "label")
    # checkpoint cadence: force many commits so a checkpoint lands
    for i in range(10):
        table.merge(
            _df(spark, [(i, f"m{i}", 2 + i)],
                "id long, label string, version int"),
            ["version"],
        )
    fresh = TxnTable(table.spark, table.path)
    assert "label" in fresh.snapshot().columns
    assert {r.label for r in fresh.lookup([3]).collect()} == {"m3"}
    # compact rewrites files under the PHYSICAL name; reads unchanged
    table.compact(min_files=1)
    assert {r.label for r in table.lookup([3]).collect()} == {"m3"}
    # restore reverts DATA, not the logical surface — the same rule as
    # schema evolution (restore never reverts schema); reactivated old
    # files read fine because their physical names never changed
    table.restore(1)
    assert "label" in table.snapshot().columns
    assert {r.label for r in table.lookup([3]).collect()} == {"v3"}


def test_drop_then_compact_purges_bytes(spark, table):
    """Physical erasure procedure for a dropped column: compact
    rewrites live rows under the CURRENT logical schema, so the
    retired physical column's bytes leave the new files."""
    import pyarrow.parquet as pq

    table.drop_column("version")
    table.compact(min_files=1)
    _, active, _ = table._state()
    for p in active:
        d = os.path.join(table.path, p)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                cols = pq.read_schema(os.path.join(d, f)).names
                assert "version" not in cols, p
    assert set(table.snapshot().columns) == {"id", "val"}
