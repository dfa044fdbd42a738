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

RETRY_ATTEMPTS = 3  # reference: `for attempt in range(1, 4)` (3 tries)
RETRY_BACKOFF_S = 5.0  # reference: `time.sleep(5)` between attempts


class RateLimited(Exception):
    """HTTP 429: the transport must raise this to stop the fetch loop.

    Reference semantics (``get_games_from_tv.py:161-163``): a 429 exits
    immediately — no retry, no further keys. The engine form stops the
    partition's fetch loop; unfetched keys are omitted from the output so
    their flags stay unset and the next run retries them (same contract
    as the time-budget governor).
    """


def fetch_with_retry(
    fetch: Callable[[str], str | None],
    key: str,
    attempts: int = RETRY_ATTEMPTS,
    backoff_s: float = RETRY_BACKOFF_S,
    sleeper: Callable[[float], None] = time.sleep,
) -> str | None:
    """Reference retry loop (``get_games_from_tv.py:160-176``): up to
    ``attempts`` tries with ``backoff_s`` sleep between; ``RateLimited``
    propagates immediately (429 never retries); exhausted retries → None
    (miss, distinguishable from never-asked)."""
    for attempt in range(1, attempts + 1):
        try:
            return fetch(key)
        except RateLimited:
            raise
        except Exception:
            if attempt < attempts:
                sleeper(backoff_s)
    return None


def fetch_bodies(
    keys: DataFrame,
    fetch: Callable[[str], str | None],
    key_col: str = "id_user",
    seconds_per_key: float = 0.0,
    num_partitions: int | None = None,
    time_budget_s: float | None = None,
    retry_attempts: int = RETRY_ATTEMPTS,
    retry_backoff_s: float = RETRY_BACKOFF_S,
    sleeper: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """(key) DataFrame → (key, body) via per-partition paced fetching.

    ``fetch``: key → body-string or None (reference returns None on any
    HTTP error, ``backfill_user_profiles.py:144-153``). A None body is
    kept as a NULL row so callers can distinguish miss from never-asked.
    Transient errors retry ``retry_attempts`` times with
    ``retry_backoff_s`` sleeps (``get_games_from_tv.py:160-176``); a
    ``RateLimited`` (HTTP 429) stops the partition's loop — remaining
    keys are omitted so the next run retries them (``:161-163``).

    ``time_budget_s``: per-partition wall-clock budget — the engine form
    of the reference's SCRIPT_TIME_LIMIT (``backfill_user_profiles.py:116``).
    Keys not reached before the deadline are *omitted* from the output, so
    their flags stay unset and the next run retries them — exactly the
    reference's unfinished-batch behavior.

    ``sleeper`` is injectable (tests pass a fake clock; production uses
    ``time.sleep``) and paces both the per-key rate limit and backoff.
    """
    src = keys.select(keys[key_col].cast("string").alias("key"))
    if num_partitions:
        src = src.repartition(num_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        deadline = time.monotonic() + time_budget_s if time_budget_s is not None else None
        rate_limited = False
        for pdf in batches:
            keys_out, bodies = [], []
            for k in pdf["key"]:
                if rate_limited or (
                    deadline is not None and time.monotonic() >= deadline
                ):
                    break
                if seconds_per_key:
                    sleeper(seconds_per_key)
                try:
                    bodies.append(
                        fetch_with_retry(
                            fetch, k, retry_attempts, retry_backoff_s, sleeper
                        )
                    )
                except RateLimited:
                    rate_limited = True  # stop: key omitted → retried next run
                    break
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
