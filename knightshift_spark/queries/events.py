"""Event-stream queries: sessionization, per-group top-k, as-of join.

These are the batch forms of the streaming operators in
``knightshift_spark.streaming`` — same transform functions, so streaming
and batch stay semantically identical (the reference's poll-loop
micro-batching has no event-time semantics to preserve; these extend it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knightshift_spark.queries import query
from knightshift_spark.tables import load_table as t

SESSION_GAP_S = 1800


@query(
    "q39_sessionize",
    oracle="""
      WITH x AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(floor(epoch(ts)) AS BIGINT)
                            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, event_id,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id,
             ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_sum
      FROM x""",
    doc="gap-based sessionization (30 min) — the batch twin of the "
        "reference's stream record-izer (OP-02): lag + running sum, one "
        "shuffle. Gap arithmetic is integer seconds on BOTH engines "
        "(floor(epoch) ↔ unix_timestamp's truncation) so a gap landing in "
        "(1799,1801) classifies identically. Absorbs former "
        "q51_moving_window: the bounded-frame moving sum shares the same "
        "partition/order, so it rides the same single shuffle",
)
def q39(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf, "events")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(F.lag("ts").over(w).isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    wmov = w.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(new_s).over(wsum).cast("bigint").alias("session_id"),
        F.round(F.sum("value").over(wmov), 4).alias("mov_sum"),
    )


@query(
    "q40_topk_per_group",
    oracle="""
      WITH r AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rn
        FROM events)
      SELECT user_id, event_id, ROUND(value, 2) AS v, CAST(rn AS INT) AS rn
      FROM r WHERE rn <= 2""",
    doc="per-group top-k via ranked window (deterministic tie-break); "
        "carries former q21_row_number's ranking-window coverage — "
        "row_number over a partitioned total order, one shuffle",
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return (
        t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("user_id", "event_id", F.round("value", 2).alias("v"), "rn")
    )


@query(
    "q64_range_frame",
    oracle="""
      SELECT user_id, event_id,
             CAST(COUNT(*) OVER (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_last_hour
      FROM events""",
    doc="event-time RANGE frame: per-event count of same-user events in "
        "the trailing hour (value-based frame, not row-based) — the batch "
        "form of a sliding-window stream aggregate. Both engines order by "
        "integer seconds: DuckDB's epoch() keeps sub-second fractions, "
        "Spark's unix_timestamp truncates — unaligned, a pair exactly an "
        "hour apart lands in different frames",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return t(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour"),
    )


@query(
    "q41_asof_join",
    oracle="""
      WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'view' THEN event_id END AS view_id
        FROM events WHERE event_type IN ('view', 'purchase')),
      carried AS (
        SELECT user_id, ts, event_id, event_type,
               LAST_VALUE(view_id IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_id
        FROM tagged)
      SELECT event_id, last_view_id FROM carried WHERE event_type = 'purchase'""",
    doc="as-of join (purchase → most recent prior view, per user) via the "
        "union+last_value carry-forward — one shuffle, no range join, the "
        "scalable as-of pattern Spark lacks natively",
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events").filter(F.col("event_type").isin("view", "purchase"))
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("view_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.withColumn("last_view_id", F.last("view_id", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "last_view_id")
    )


@query(
    "q73_interval_stream_join",
    oracle="""
      SELECT l.user_id,
             l.event_id AS view_event,
             r.event_id AS purchase_event,
             CAST(floor(epoch(r.ts)) - floor(epoch(l.ts)) AS BIGINT) AS gap_s,
             ROUND(l.value + r.value, 4) AS pair_value
      FROM events l JOIN events r
        ON l.user_id = r.user_id
       AND l.event_type = 'view' AND r.event_type = 'purchase'
       AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR""",
    doc="event-time-bounded interval join (view → purchases within 6 h, "
        "per user) through streaming/joins.stream_stream_interval_join — "
        "the SAME function that runs the watermarked stream-stream join "
        "(batch mode: watermarks no-op, the bound is an interval "
        "predicate), so the streaming operator's join semantics sit under "
        "the exact-hash oracle gate. One equi-shuffle on user_id; the "
        "time bound is a post-join filter, never a cross join (r12)",
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    from knightshift_spark.streaming.joins import stream_stream_interval_join

    ev = t(spark, sf, "events")
    left = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_event"),
        "ts",
        F.col("value").alias("lv"),
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event"),
        "ts",
        F.col("value").alias("rv"),
    )
    joined = stream_stream_interval_join(
        left,
        right,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        lower="0 seconds",
        upper="6 hours",
    )
    return joined.select(
        "user_id",
        "view_event",
        "purchase_event",
        (F.unix_timestamp("ts_r") - F.unix_timestamp("ts"))
        .cast("bigint")
        .alias("gap_s"),
        F.round(F.col("lv") + F.col("rv"), 4).alias("pair_value"),
    )
