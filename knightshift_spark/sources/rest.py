"""REST point-lookup source (OP-04/OP-05) as a distributed, rate-limited
``mapInPandas`` fetcher with an injectable transport.

The reference fetches one profile per HTTP GET with 0.5 s/key pacing
(``backfill_user_profiles.py:112-117,144-153``). Here the distinct-key
DataFrame partitions across executors; each partition paces its own
requests, so cluster-wide throughput = executors × per-executor rate —
the knob the reference lacked. Tests inject an offline ``fetch`` callable
(FIXTURES.md §4 bodies); production passes an HTTP closure.

At 100 TB the key set after ``distinct()`` is the small side by
definition (user ids, game ids) — repartition to
``min(keys/1000, executors×4)`` so pacing, not task scheduling,
dominates.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("body", T.StringType(), True),  # NULL on fetch miss
    ]
)


def fetch_bodies(
    keys: DataFrame,
    fetch: Callable[[str], str | None],
    key_col: str = "id_user",
    seconds_per_key: float = 0.0,
    num_partitions: int | None = None,
    time_budget_s: float | None = None,
) -> DataFrame:
    """(key) DataFrame → (key, body) via per-partition paced fetching.

    ``fetch``: key → body-string or None (reference returns None on any
    HTTP error, ``backfill_user_profiles.py:144-153``). A None body is
    kept as a NULL row so callers can distinguish miss from never-asked.

    ``time_budget_s``: per-partition wall-clock budget — the engine form
    of the reference's SCRIPT_TIME_LIMIT (``backfill_user_profiles.py:116``).
    Keys not reached before the deadline are *omitted* from the output, so
    their flags stay unset and the next run retries them — exactly the
    reference's unfinished-batch behavior.
    """
    src = keys.select(keys[key_col].cast("string").alias("key"))
    if num_partitions:
        src = src.repartition(num_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        deadline = time.monotonic() + time_budget_s if time_budget_s is not None else None
        for pdf in batches:
            keys_out, bodies = [], []
            for k in pdf["key"]:
                if deadline is not None and time.monotonic() >= deadline:
                    break
                if seconds_per_key:
                    time.sleep(seconds_per_key)
                try:
                    bodies.append(fetch(k))
                except Exception:
                    bodies.append(None)  # never fail the job on one key
                keys_out.append(k)
            yield pd.DataFrame({"key": keys_out, "body": bodies})

    return src.mapInPandas(run, schema=FETCH_RESULT_SCHEMA)


def profile_bodies_source(
    keys: DataFrame, fetch: Callable[[str], str | None], **kw
) -> DataFrame:
    """Adapter matching ``pipelines.enrich.enrich_users`` input contract:
    (id_user, body), fetch-misses dropped (reference skips them)."""
    out = fetch_bodies(keys, fetch, **kw)
    return out.filter(out.body.isNotNull()).withColumnRenamed("key", "id_user")
