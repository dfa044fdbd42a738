"""Watermarked stream-stream interval join (streaming/joins.py)."""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import functions as F

from knightshift_spark.streaming.joins import stream_stream_interval_join

SCH_L = "k string, ts timestamp, ev string"
SCH_R = "k string, ts timestamp, attr string"


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 12, 0, 0) + dt.timedelta(minutes=minute)


def _write(spark, d, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(d))


def _stream(spark, d, schema):
    return spark.readStream.schema(schema).format("parquet").load(str(d))


def test_stream_stream_join_matches_batch_oracle(spark, tmp_path):
    """Out-of-order batches: the streaming inner join equals the batch
    join over everything NOT late beyond the watermark, and the
    late-beyond-watermark right row is exactly what the stream drops."""
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(), rdir.mkdir()
    # batch 1 — left events at :00 :05 :10, right dims at :02 :07
    _write(spark, ldir, SCH_L, [("a", _t(0), "e0"), ("a", _t(5), "e1"),
                                ("b", _t(10), "e2")])
    _write(spark, rdir, SCH_R, [("a", _t(2), "d0"), ("b", _t(7), "d1")])
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    out = stream_stream_interval_join(
        _stream(spark, ldir, SCH_L),
        _stream(spark, rdir, SCH_R),
        key="k", left_ts="ts", right_ts="ts",
        lower="5 minutes", upper="5 minutes",
        left_watermark="10 minutes", right_watermark="10 minutes",
    )
    # ONE continuous query: the watermark accumulates across the
    # out-of-order file drops below (a fresh query would reset it)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    q.processAllAvailable()

    # batch 2 — OUT OF ORDER but inside the watermark: joins fine
    _write(spark, ldir, SCH_L, [("b", _t(4), "e3")])
    q.processAllAvailable()

    # batch 3 — advance event time far ahead on BOTH sides (the global
    # watermark is the MIN across sources), then a right row whose
    # event time is now BEYOND the watermark: dropped by the stream
    _write(spark, ldir, SCH_L, [("c", _t(50), "e4")])
    _write(spark, rdir, SCH_R, [("c", _t(50), "adv")])
    q.processAllAvailable()
    _write(spark, rdir, SCH_R, [("a", _t(1), "late")])  # wm ≈ :40
    q.processAllAvailable()
    q.stop()

    got = {
        (r["k"], r["ev"], r["attr"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # batch oracle over everything EXCEPT the late row the watermark
    # provably dropped
    bl = spark.read.parquet(str(ldir))
    br = spark.read.parquet(str(rdir)).filter(F.col("attr") != "late")
    want = {
        (r["k"], r["ev"], r["attr"])
        for r in stream_stream_interval_join(
            bl, br, key="k", left_ts="ts", right_ts="ts",
            lower="5 minutes", upper="5 minutes",
        ).collect()
    }
    assert got == want
    assert ("a", "e0", "d0") in got and ("b", "e3", "d1") in got
    # the late right row WOULD have matched in pure batch — its absence
    # from the stream is the watermark doing its job
    full = {
        (r["k"], r["ev"], r["attr"])
        for r in stream_stream_interval_join(
            bl, spark.read.parquet(str(rdir)), key="k",
            lower="5 minutes", upper="5 minutes",
        ).collect()
    }
    assert ("a", "e0", "late") in full and ("a", "e0", "late") not in got


def test_stream_stream_left_outer_emits_expired_side(spark, tmp_path):
    """A left row with no match emits null-padded ONLY after both
    watermarks prove no match can arrive — the expiry half of the
    contract."""
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(), rdir.mkdir()
    _write(spark, ldir, SCH_L, [("x", _t(0), "lonely"), ("y", _t(1), "pair")])
    _write(spark, rdir, SCH_R, [("y", _t(2), "dim")])
    name = f"ssjo_{uuid.uuid4().hex[:8]}"
    out = stream_stream_interval_join(
        _stream(spark, ldir, SCH_L),
        _stream(spark, rdir, SCH_R),
        key="k", left_ts="ts", right_ts="ts",
        lower="2 minutes", upper="2 minutes",
        left_watermark="5 minutes", right_watermark="5 minutes",
        how="left_outer",
    )
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    q.processAllAvailable()
    got = {
        (r["k"], r["ev"], r["attr"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert ("y", "pair", "dim") in got
    assert ("x", "lonely", None) not in got  # not provably unmatched yet
    # advance BOTH watermarks far past x's interval, then trigger again
    _write(spark, ldir, SCH_L, [("z", _t(60), "adv_l")])
    _write(spark, rdir, SCH_R, [("z", _t(60), "adv_r")])
    q.processAllAvailable()
    # outer results flush on a trigger AFTER the watermark advance: one
    # more (empty) drop forces it
    _write(spark, ldir, SCH_L, [("z2", _t(61), "adv_l2")])
    _write(spark, rdir, SCH_R, [("z2", _t(61), "adv_r2")])
    q.processAllAvailable()
    q.stop()
    got = {
        (r["k"], r["ev"], r["attr"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert ("x", "lonely", None) in got  # watermark-expired: null-padded


def test_outer_join_keys_survive_unmatched_right(spark, tmp_path):
    """r12 review: right_outer/full_outer must carry the KEY for
    unmatched right rows (coalesced across sides), never emit them
    anonymously with a NULL key."""
    l = spark.createDataFrame([("a", _t(0), "e0")], SCH_L)
    r = spark.createDataFrame(
        [("a", _t(1), "d0"), ("zzz", _t(2), "orphan")], SCH_R
    )
    out = stream_stream_interval_join(
        l, r, key="k", lower="5 minutes", upper="5 minutes",
        how="right_outer",
    ).collect()
    by_attr = {row["attr"]: row for row in out}
    assert by_attr["orphan"]["k"] == "zzz" and by_attr["orphan"]["ev"] is None
    assert by_attr["d0"]["k"] == "a" and by_attr["d0"]["ev"] == "e0"
    full = stream_stream_interval_join(
        l, r, key="k", lower="5 minutes", upper="5 minutes",
        how="full_outer",
    ).collect()
    assert {row["k"] for row in full} == {"a", "zzz"}
