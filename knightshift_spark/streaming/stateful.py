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
