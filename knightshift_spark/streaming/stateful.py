"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no stateful streaming (its dedup is absorbed by the
idempotent DB upsert); these are engine extensions for pipelines where
the sink is append-only (e.g. parquet/object storage) and duplicates must
be dropped *before* the write.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, delay: str = "1 hour"
) -> DataFrame:
    """Event-time dedup with bounded state: duplicates of a key arriving
    within ``delay`` of the watermark are dropped; state for keys older
    than the watermark is evicted automatically.

    This is the production form of streaming dedup at 100 TB — unbounded
    key state (``streaming_dedup_by_key``) eventually exhausts the state
    store; watermarked dedup trades completeness outside the window for
    O(active-window) state.
    """
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def streaming_dedup_by_key(df: DataFrame, key_col: str = "id_game") -> DataFrame:
    """Cross-micro-batch first-writer-wins dedup on ``key_col``.

    Keeps a per-key boolean in the state store; only the first row ever
    seen for a key is emitted. State is partitioned by key (one shuffle),
    scales horizontally, and survives restarts via the checkpoint.
    Use when the downstream sink cannot merge (append-only), otherwise
    prefer the idempotent merge (``operators.merge.upsert``).
    """
    out_schema = df.schema
    state_schema = "seen boolean"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.iloc[:1]
                break
        state.update((True,))
        if first is not None:
            yield first

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Event-time SESSION WINDOWS as a custom stateful operator: emit
    one row (key, session_start, session_end, n_events) per maximal
    event run whose inter-event gaps stay within ``gap`` — the
    streaming twin of the batch sessionizer (q39), built on
    ``applyInPandasWithState`` + event-time timeout.

    Mechanics per key: events of a micro-batch are sorted by event
    time and split at gaps > ``gap``; every run closed WITHIN the batch
    emits immediately (its closing gap is witnessed by data), the final
    still-open run persists in the state store — (start, last, n), a
    fixed-size tuple, O(active keys) state — and a timeout is armed at
    ``last + gap``. When the WATERMARK (late-data bound
    ``watermark_delay``) passes that mark with no newer events, the
    timeout fires and the session closes by silence. Late events inside
    the watermark that REOPEN a quiet session simply extend the state;
    events later than the watermark are dropped upstream by Spark —
    the standard correctness trade, stated rather than hidden.

    Timestamps live in state as epoch millis; the emitted bounds are
    proper timestamps. A late event predating the open session's start
    extends the session forward only (start stays) — sessions never
    move backwards once opened.
    """
    gap_ms = _duration_ms(gap)
    src = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.col(ts_col).cast("timestamp").alias("t"),
    ).withWatermark("t", watermark_delay)
    out_schema = (
        "k string, session_start timestamp, session_end timestamp, n_events long"
    )
    state_schema = "start_ms long, last_ms long, n long"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield _session_row(key[0], start_ms, last_ms, n)
            return
        ts: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                # pd.notna, not `is not None`: a null event time arrives
                # as NaT, whose .value is int64-min — one such row would
                # seed a year-1677 session
                ts.extend(
                    int(v.value // 1_000_000) for v in pdf["t"] if pd.notna(v)
                )
        if not ts:
            return
        ts.sort()
        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms, last_ms, n = ts[0], ts[0], 0
        for t in ts:
            if t - last_ms > gap_ms:
                yield _session_row(key[0], start_ms, last_ms, n)
                start_ms, n = t, 0
            last_ms = max(last_ms, t)
            n += 1
        state.update((start_ms, last_ms, n))
        state.setTimeoutTimestamp(last_ms + gap_ms)

    return src.groupBy("k").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _session_row(key: str, start_ms: int, last_ms: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "k": [key],
            "session_start": [pd.Timestamp(start_ms, unit="ms")],
            "session_end": [pd.Timestamp(last_ms, unit="ms")],
            "n_events": [n],
        }
    )


def _duration_ms(text: str) -> int:
    """'30 minutes' / '90 seconds' / '2 hours' → milliseconds (the same
    tiny grammar Spark interval strings use for these operators)."""
    qty, unit = text.strip().split()
    mult = {
        "second": 1_000, "seconds": 1_000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
        "day": 86_400_000, "days": 86_400_000,
    }
    if unit not in mult:
        raise ValueError(f"unsupported duration unit {unit!r} in {text!r}")
    return int(qty) * mult[unit]
