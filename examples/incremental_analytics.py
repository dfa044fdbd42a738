"""Example — incremental analytics over an event stream.

The operational set a continuously-ingesting deployment runs:

  event spool → streaming SESSION WINDOWS (custom stateful operator)
             → incrementally-maintained AGGREGATE VIEW (per event_type)
             → event-time-bounded STREAM-STREAM interval join
  plus an ACID TxnTable whose aggregate view maintains ITSELF from the
  commit log (CDC-driven sync), and the layout hygiene a long-lived
  table needs: key-skew diagnosis before choosing a join strategy, and
  measured small-file compaction.

Runnable against the driver testdata:

    python examples/incremental_analytics.py [sf_dir] [work_dir]

NOT imported by the engine or its tests — a usage demonstration.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from knightshift_spark.plans.layout import compact_parquet, key_skew_report  # noqa: E402
from knightshift_spark.session import get_spark  # noqa: E402
from knightshift_spark.streaming.matview import read_view, run_matview_stream  # noqa: E402
from knightshift_spark.streaming.stateful import sessionize_stream  # noqa: E402
from knightshift_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/incremental_analytics"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(f"{work}/spool")
    spark = get_spark("incremental-analytics")

    events = load_table(spark, sf_dir, "events")

    # 0. is user_id a safe join/agg key? price the mitigation first
    print("key-skew report for user_id:")
    key_skew_report(events, ["user_id"]).show(truncate=False)

    # simulate a spool: three chronological drops of the event table
    n = events.count()
    for i, (lo, hi) in enumerate([(0.0, 0.4), (0.4, 0.8), (0.8, 1.01)]):
        events.orderBy("ts").withColumn(
            "__r", F.row_number().over(Window.orderBy("ts"))
        ).filter(
            (F.col("__r") > lo * n) & (F.col("__r") <= hi * n)
        ).drop("__r").coalesce(1).write.json(f"{work}/spool/drop{i}")

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).option("maxFilesPerTrigger", 1).json(f"{work}/spool/*")

    # 1. incremental per-type aggregate view (algebraic partials + HLL)
    q1 = run_matview_stream(
        stream, f"{work}/view", ["event_type"], "value",
        checkpoint_dir=f"{work}/ck_view",
    )
    # 2. streaming session windows per user (30 min gap)
    q2 = (
        sessionize_stream(stream, "user_id", "ts", gap="30 minutes")
        .writeStream.format("parquet")
        .option("path", f"{work}/sessions")
        .option("checkpointLocation", f"{work}/ck_sessions")
        .outputMode("append")
        .start()
    )
    q1.processAllAvailable()
    q2.processAllAvailable()
    q1.stop()
    q2.stop()

    print("incrementally-maintained per-type view:")
    read_view(spark, f"{work}/view").orderBy("event_type").show(truncate=False)
    sessions = spark.read.parquet(f"{work}/sessions")
    print(f"closed sessions so far: {sessions.count()}")
    sessions.orderBy(F.col("n_events").desc()).show(5, truncate=False)

    # 3. layout hygiene: the stream's per-batch files → target-sized files
    print(
        compact_parquet(
            spark, f"{work}/sessions", f"{work}/sessions_compacted",
            target_file_mb=256, order_by=["k"],
        )
    )

    # 4. (r12) event-time-bounded stream-stream join: views joined to
    # the purchases that followed within 6 hours, per user — the same
    # function runs watermarked on two live streams; batch mode here
    # doubles as its own correctness oracle (q73)
    from knightshift_spark.streaming.joins import stream_stream_interval_join

    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event"), "ts"
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_event"), "ts"
    )
    pairs = stream_stream_interval_join(
        views, buys, key="user_id", lower="0 seconds", upper="6 hours"
    )
    print(f"view→purchase pairs within 6h: {pairs.count()}")

    # 5. (r12) CDC-driven matview: an ACID table's per-group view
    # maintains itself from the commit log — merges and deletes both
    # sync exactly, at cost proportional to the CHANGED groups
    from knightshift_spark.sources.txntable import TxnTable
    from knightshift_spark.streaming.matview import (
        read_view as read_view2,
        sync_view_from_table,
    )

    t = TxnTable.create(
        spark, f"{work}/acid", keys=["event_id"],
        schema="event_id long, event_type string, value double, user_id long",
        n_buckets=4,
    )
    t.append(
        events.select("event_id", "event_type", "value", "user_id").limit(500)
    )
    # (r13) MULTI-MEASURE: value AND user_id statistics in ONE
    # scan/view — pass a list instead of running N parallel views
    # (user_id_n_distinct_approx = distinct active users per type)
    measures = ["value", "user_id"]
    sync_view_from_table(t, f"{work}/acid_view", ["event_type"], measures)
    t.delete_where(F.col("event_type") == "error", rewrite_all=True)
    v = sync_view_from_table(t, f"{work}/acid_view", ["event_type"], measures)
    print(f"CDC-synced two-measure view at table version {v} (deletes applied):")
    read_view2(spark, f"{work}/acid_view").orderBy("event_type").select(
        "event_type", "value_n", "value_sum", "value_avg",
        "user_id_n_distinct_approx",
    ).show(truncate=False)

    # 6. (r13) governance on the live table: a CHECK constraint added
    # AFTER data exists validates the whole table in one scan inside
    # the ALTER commit; a conditional MERGE then lands an update batch
    # and a predicate delete as ONE statement / ONE commit
    t.add_constraint("value_finite", "value IS NULL OR abs(value) < 1e12")
    print(f"constraints in force: {t.constraints()}")
    updates = (
        events.select("event_id", "event_type", "value", "user_id")
        .limit(200)
        .withColumn("value", F.col("value") * 2)
    )
    t.merge(
        updates,
        order_by=["value"],
        delete_where=F.col("value") < 0,  # fused, never written
    )
    print(f"one-statement merge+delete landed as version {t.version()}")
    # conditional UPDATE (r13): SET expressions see the PRE-image row
    t.update_where(
        F.col("event_type") == "signup",
        {"value": F.col("value") * 1.1},
    )
    print(f"update_where landed as version {t.version()}")

    # 7. (r13) incremental SCD2: materialize the full row-image history
    # once, then each sync folds only the commits since the last one —
    # the audit table a validated/cleaned-state pipeline keeps
    from knightshift_spark.sources.txntable import (
        read_scd2,
        sync_scd2_from_table,
    )

    sync_scd2_from_table(t, f"{work}/acid_history")
    hist = read_scd2(spark, f"{work}/acid_history")
    open_rows = hist.filter(F.col("__valid_to").isNull()).count()
    print(
        f"SCD2 history: {hist.count()} row images, {open_rows} open "
        f"(== current snapshot rows: {t.snapshot().count()})"
    )

    # 8. (late r13) deletion vectors: a GDPR key purge and a predicate
    # delete as MERGE-ON-READ — positions written, no bucket rewritten;
    # the next compact materializes the masks, vacuum reclaims them
    before = t.version()
    some_keys = t.snapshot().select("event_id").limit(3)
    t.delete_keys(some_keys, deletion_vectors=True)
    t.delete_where(F.col("value") > 1e12, deletion_vectors=True)  # no-op here
    rpt = t.maintenance_report()
    print(
        f"DV takedown: {t.version() - before} mask commit(s), "
        f"{rpt['dv_rows']} masked positions, max chain {rpt['max_dv_chain']}"
        f" — rows now {t.snapshot().count()}"
    )
    t.compact(min_files=1)  # physical erasure: masks materialized...
    t.vacuum(retention_s=0.0)  # ...and position datasets reclaimed
    print(
        f"after purge-compact: dv_rows={t.maintenance_report()['dv_rows']}, "
        f"rows {t.snapshot().count()}"
    )

    # 9. (late r13) UPDATE with a joined source: Delta's MERGE WHEN
    # MATCHED UPDATE as one call — SET sees pre-image + source columns
    dim = t.snapshot().select("event_id").limit(2).withColumn(
        "boost", F.lit(2.0)
    )
    t.update_from(dim, {"value": F.col("value") * F.col("boost")})
    print(f"update_from landed as version {t.version()}")


if __name__ == "__main__":
    main()
