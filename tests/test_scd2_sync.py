"""Incremental SCD2 materializer (r13, VERDICT r12 item 4).

``scd2_history`` replays the whole retained log per call;
``sync_scd2_from_table`` maintains a materialized history table with
cost ∝ changed keys per sync. The binding property: after EVERY
mutation + sync, the materialized history equals a fresh full build —
including updates, deletes, transactions, restores, and a schema
evolution — and a crashed sync replays idempotently.

Reference capability anchor: the validated/cleaned-state audit kept
via ``ind_validated``/``tm_validated``
(``validate_tv_channel_games.py:143-157``), generalized to full
row-image history.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from knightshift_spark.sources.txntable import (
    TxnTable,
    read_scd2,
    sync_scd2_from_table,
)

SCHEMA = "id long, val string, version int"


def _df(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def _canon(df):
    from collections import Counter

    cols = sorted(df.columns)
    return Counter(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def _assert_synced_equals_full(spark, t, path):
    synced = sync_scd2_from_table(t, path, n_buckets=4)
    assert synced == t.version()
    got = read_scd2(spark, path)
    want = t.scd2_history()
    assert _canon(got) == _canon(want)


def test_incremental_sync_equals_full_build_after_every_step(spark, tmp_path):
    """The core property: incrementally-synced history ≡ full rebuild
    after every mutation step, across insert / update / delete / fused
    txn / restore — the full mutation alphabet."""
    t = TxnTable.create(
        spark, str(tmp_path / "t"), keys=["id"], schema=SCHEMA, n_buckets=3
    )
    path = str(tmp_path / "hist")
    steps = [
        lambda: t.append(_df(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)])),
        lambda: t.merge(_df(spark, [(2, "b2", 2), (4, "d", 1)]), ["version"]),
        lambda: t.delete_keys(spark.createDataFrame([(1,)], "id long")),
        lambda: t.merge(_df(spark, [(3, "c2", 3), (5, "e", 1)]), ["version"]),
        lambda: t.restore(2),
        lambda: t.merge(_df(spark, [(6, "f", 1)]), ["version"]),
        lambda: t.compact(),  # moves no rows: sync must no-op cleanly
    ]
    for step in steps:
        step()
        _assert_synced_equals_full(spark, t, path)
    # re-sync at the same version is a no-op returning the version
    v = t.version()
    assert sync_scd2_from_table(t, path, n_buckets=4) == v


def test_fused_transaction_and_multi_commit_catchup(spark, tmp_path):
    """One sync call folds MULTIPLE unsynced commits (the scheduled-
    maintainer shape), including a fused multi-statement transaction."""
    t = TxnTable.create(
        spark, str(tmp_path / "t"), keys=["id"], schema=SCHEMA, n_buckets=2
    )
    path = str(tmp_path / "hist")
    t.append(_df(spark, [(i, f"v{i}", 1) for i in range(8)]))
    _assert_synced_equals_full(spark, t, path)
    # three commits, one catch-up
    t.merge(_df(spark, [(0, "u0", 2), (9, "n9", 1)]), ["version"])
    with t.transaction():
        t.merge(_df(spark, [(1, "u1", 2)]), ["version"])
        t.delete_where(F.col("id") == 2, rewrite_all=True)
    t.delete_keys(spark.createDataFrame([(3,)], "id long"))
    _assert_synced_equals_full(spark, t, path)


def test_crash_replay_is_idempotent(spark, tmp_path):
    """A crash AFTER some bucket overwrites but BEFORE the sidecar
    stamp replays the whole range: buckets that already absorbed the
    target version SKIP via the per-bucket __last_batch watermark (the
    done path — exercised here by rewinding the sidecar while bucket
    data stays at the target), stale buckets recompute, and the result
    equals the full build. Also covers the all-done and no-sidecar
    (full rebuild) shapes."""
    import shutil

    t = TxnTable.create(
        spark, str(tmp_path / "t"), keys=["id"], schema=SCHEMA, n_buckets=2
    )
    path = str(tmp_path / "hist")
    t.append(_df(spark, [(i, f"v{i}", 1) for i in range(12)]))
    sync_scd2_from_table(t, path, n_buckets=4)
    pre = str(tmp_path / "pre")
    shutil.copytree(path, pre)  # the state a crashed sync started from
    old_sidecar = open(os.path.join(path, "_SYNCED_VERSION")).read()
    t.merge(
        _df(spark, [(i, f"u{i}", 2) for i in range(0, 12, 2)]), ["version"]
    )
    assert sync_scd2_from_table(t, path, n_buckets=4) == t.version()
    want = _canon(read_scd2(spark, path))

    # crash shape 1 — ALL buckets written, stamp lost: rewind the
    # sidecar only; the replay must take the done path for every bucket
    with open(os.path.join(path, "_SYNCED_VERSION"), "w") as f:
        f.write(old_sidecar)
    assert sync_scd2_from_table(t, path, n_buckets=4) == t.version()
    assert _canon(read_scd2(spark, path)) == want

    # crash shape 2 — SOME buckets written: rewind the sidecar AND
    # restore half the bucket dirs to their pre-sync state; done
    # buckets skip, stale buckets recompute, and the result converges
    with open(os.path.join(path, "_SYNCED_VERSION"), "w") as f:
        f.write(old_sidecar)
    buckets = sorted(
        e for e in os.listdir(pre) if e.startswith("__bucket=")
    )
    assert len(buckets) >= 2  # the split below must leave both kinds
    for b in buckets[: len(buckets) // 2]:
        shutil.rmtree(os.path.join(path, b), ignore_errors=True)
        shutil.copytree(os.path.join(pre, b), os.path.join(path, b))
    assert sync_scd2_from_table(t, path, n_buckets=4) == t.version()
    assert _canon(read_scd2(spark, path)) == want

    # crash shape 3 — sidecar missing entirely: full rebuild, same end
    os.remove(os.path.join(path, "_SYNCED_VERSION"))
    assert sync_scd2_from_table(t, path, n_buckets=4) == t.version()
    assert _canon(read_scd2(spark, path)) == want
    assert _canon(read_scd2(spark, path)) == _canon(t.scd2_history())


def test_sync_rides_schema_evolution(spark, tmp_path):
    """A widening merge inside the unsynced range: pre-evolution images
    read NULL for the new column in BOTH the materialized history and
    the full rebuild."""
    t = TxnTable.create(
        spark, str(tmp_path / "t"), keys=["id"], schema=SCHEMA, n_buckets=2
    )
    path = str(tmp_path / "hist")
    t.append(_df(spark, [(1, "a", 1)]))
    sync_scd2_from_table(t, path, n_buckets=4)
    t.merge(
        _df(
            spark,
            [(1, "a2", 2, "x")],
            "id long, val string, version int, extra string",
        ),
        ["version"],
        evolve=True,
    )
    _assert_synced_equals_full(spark, t, path)
    rows = {
        (r.id, r.val, r["extra"], r["__valid_from"], r["__valid_to"])
        for r in read_scd2(spark, path).collect()
    }
    assert (1, "a", None, 1, 2) in rows
    assert (1, "a2", "x", 2, None) in rows


def test_blind_append_guard_fires_on_incremental_path(spark, tmp_path):
    """A blind re-append of a live key inside the unsynced range has no
    interval representation — the incremental close must raise exactly
    like the full build (the open row rides the same guard as a
    pseudo-insert event)."""
    t = TxnTable.create(
        spark, str(tmp_path / "t"), keys=["id"], schema=SCHEMA, n_buckets=2
    )
    path = str(tmp_path / "hist")
    t.append(_df(spark, [(7, "first", 1)]))
    sync_scd2_from_table(t, path, n_buckets=4)
    t.append(_df(spark, [(7, "second", 2)]))  # legal append, 2 live rows
    with pytest.raises(Exception, match="unique live keys"):
        sync_scd2_from_table(t, path, n_buckets=4)


def test_materialized_history_outlives_log_retention(spark, tmp_path):
    """The reason the materializer exists at 100 TB: once commits
    expire from the log, scd2_history() can never be rebuilt from
    commit 1 — but the materialized history already holds every
    pre-expiry image, and incremental syncs keep working from the
    retained tail."""
    from knightshift_spark.sources import txntable as mod
    from knightshift_spark.sources.txntable import VacuumedVersionError

    t = TxnTable.create(
        spark, str(tmp_path / "t"), keys=["id"], schema=SCHEMA, n_buckets=2
    )
    path = str(tmp_path / "hist")
    t.append(_df(spark, [(1, "a", 1), (2, "b", 1)]))
    t.merge(_df(spark, [(1, "a2", 2)]), ["version"])
    sync_scd2_from_table(t, path, n_buckets=4)

    def _images(df):
        # image identity EXCLUDES __valid_to: an interval open at sync
        # time legitimately closes when a later commit replaces the row
        return {
            (r.id, r.val, r.version, r["__valid_from"]) for r in df.collect()
        }

    early_images = _images(read_scd2(spark, path))
    assert len(early_images) == 3  # a, a2, b
    # roll past a checkpoint so expire_log can drop the early commits
    while t.version() < mod._CHECKPOINT_EVERY:
        t.merge(_df(spark, [(2, f"b{t.version()}", t.version())]), ["version"])
        sync_scd2_from_table(t, path, n_buckets=4)
    t.expire_log(retention_s=0.0)
    # the full rebuild is now impossible...
    with pytest.raises(VacuumedVersionError):
        t.scd2_history().collect()
    # ...but the materialized history kept every pre-expiry image
    assert early_images <= _images(read_scd2(spark, path))
    # and incremental syncs continue from the retained tail
    t.merge(_df(spark, [(3, "c", 1)]), ["version"])
    assert sync_scd2_from_table(t, path, n_buckets=4) == t.version()
    open_now = {
        (r.id, r.val, r.version)
        for r in read_scd2(spark, path)
        .filter(F.col("__valid_to").isNull())
        .collect()
    }
    assert open_now == {
        (r.id, r.val, r.version) for r in t.snapshot().collect()
    }


def test_n_buckets_drift_refused(spark, tmp_path):
    """r13 review: a catch-up under a DIFFERENT bucket modulus than the
    history was built with would scatter a key's rows across two
    partitions and corrupt silently — refused loudly instead, even on
    an already-synced history."""
    t = TxnTable.create(
        spark, str(tmp_path / "t"), keys=["id"], schema=SCHEMA, n_buckets=2
    )
    path = str(tmp_path / "hist")
    t.append(_df(spark, [(1, "a", 1)]))
    sync_scd2_from_table(t, path, n_buckets=32)
    with pytest.raises(ValueError, match="n_buckets=32"):
        sync_scd2_from_table(t, path, n_buckets=64)  # no-op call: still checked
    t.merge(_df(spark, [(1, "a2", 2)]), ["version"])
    with pytest.raises(ValueError, match="mixed-modulus"):
        sync_scd2_from_table(t, path, n_buckets=64)
    # the original modulus keeps working
    assert sync_scd2_from_table(t, path, n_buckets=32) == t.version()
    assert _canon(read_scd2(spark, path)) == _canon(t.scd2_history())
