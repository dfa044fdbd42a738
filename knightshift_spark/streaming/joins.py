"""Watermarked stream-stream joins (event-time-bounded enrichment).

The reference enriches each ingested game against a slowly-arriving
user-profile feed (`enrich_tv_channel_games.py` — batch point-lookups);
the streaming generalization is joining TWO live streams: events to a
live dimension/fact stream, matched on a key WITHIN an event-time
interval. This is the engine's last Structured Streaming primitive: the
other streaming surfaces (windowed rollups, watermarked dedup, custom
state, matview sinks) compose records within ONE stream; this one
correlates records ACROSS streams.

Spark-first and scale-honest:

- Both sides carry watermarks and the join condition carries an
  event-time BOUND (`right.ts ∈ [left.ts - lower, left.ts + upper]`).
  Together they let Spark size the join state exactly: a buffered row
  is dropped the moment the other side's watermark passes its last
  possible match — state is O(active window), never O(stream).
  An unbounded stream-stream join would buffer both streams forever;
  the bound is what makes the operator deployable at 100 TB/day.
- Outer joins emit their null-padded rows only when the watermark
  PROVES no match can arrive anymore (Spark's contract) — the test
  pins both the matched rows and this expiry behavior.
- The same function works in batch mode (watermarks are no-ops and the
  bound is an ordinary interval predicate), which is exactly what the
  equality oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two (streaming or batch) DataFrames on ``key`` where
    ``right_ts`` falls in ``[left_ts - lower, left_ts + upper]``.

    Output columns: all of ``left``'s, then ``right``'s non-key columns
    (suffixed ``_r`` on a name collision, e.g. the right timestamp when
    both sides call it ``ts``). ``how`` ∈ {inner, left_outer,
    right_outer, full_outer} — outer variants require BOTH watermarks
    (enforced by Spark) and emit null-padded rows only after the
    opposite watermark passes the row's match interval.

    State-cleanup contract (the reason for every parameter): the
    watermark bounds how LATE a row may arrive; the interval bounds how
    FAR APART matching rows may sit. Spark's state eviction needs both
    — a left row is held for ``upper + right_watermark`` of event time,
    a right row for ``lower + left_watermark``."""
    keys = [key] if isinstance(key, str) else list(key)
    lw = left.withWatermark(left_ts, left_watermark).alias("l")
    rw = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    joined = lw.join(rw, cond, how)
    lcols = list(left.columns)
    # key columns COALESCE across sides: in right_outer/full_outer an
    # unmatched right row has NULL left columns, and a left-only key
    # projection would emit it anonymously — unrecoverable for any
    # consumer grouping or re-joining on the key (r12 review)
    sel = [
        (
            F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c)
            if c in keys
            else F.col(f"l.{c}").alias(c)
        )
        for c in lcols
    ]
    for c in right.columns:
        if c in keys:
            continue
        sel.append(F.col(f"r.{c}").alias(c if c not in lcols else f"{c}_r"))
    return joined.select(*sel)
