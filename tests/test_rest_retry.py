"""REST source retry/backoff/429 semantics vs the reference loop
(``get_games_from_tv.py:155-179``): 3 attempts, 5 s backoff, no retry on
429 — with an injectable clock so tests never sleep."""

from __future__ import annotations

import pytest

from knightshift_spark.sources.rest import (
    RETRY_ATTEMPTS,
    RETRY_BACKOFF_S,
    RateLimited,
    fetch_bodies,
    fetch_with_retry,
)


class FlakyTransport:
    """Fails `n_failures` times, then succeeds."""

    def __init__(self, n_failures: int):
        self.n_failures = n_failures
        self.calls = 0

    def __call__(self, key: str) -> str:
        self.calls += 1
        if self.calls <= self.n_failures:
            raise RuntimeError("http 503")
        return f"body:{key}"


def test_retry_recovers_after_transient_failures():
    sleeps: list[float] = []
    t = FlakyTransport(2)
    body = fetch_with_retry(t, "k", sleeper=sleeps.append)
    assert body == "body:k"
    assert t.calls == 3  # reference: range(1, 4)
    assert sleeps == [RETRY_BACKOFF_S, RETRY_BACKOFF_S]  # 5 s between tries


def test_retry_gives_up_after_attempts():
    sleeps: list[float] = []
    t = FlakyTransport(99)
    assert fetch_with_retry(t, "k", sleeper=sleeps.append) is None
    assert t.calls == RETRY_ATTEMPTS
    # no sleep after the final failed attempt
    assert sleeps == [RETRY_BACKOFF_S] * (RETRY_ATTEMPTS - 1)


def test_429_never_retries():
    calls = []

    def fetch(key):
        calls.append(key)
        raise RateLimited("429")

    with pytest.raises(RateLimited):
        fetch_with_retry(fetch, "k", sleeper=lambda s: None)
    assert calls == ["k"]  # exactly one attempt


def test_429_stops_partition_and_omits_unfetched_keys(spark):
    """Keys after the 429 are OMITTED (not NULL-bodied): their flags stay
    unset so the next run retries them — the reference exits the process
    on 429 (engine form: stop the loop, keep what's fetched)."""
    keys = spark.createDataFrame(
        [("k1",), ("k2",), ("k3",), ("k4",)], "id_user string"
    ).coalesce(1)

    def fetch(k):
        if k == "k3":
            raise RateLimited("429")
        return f"body:{k}"

    rows = fetch_bodies(
        keys, fetch, num_partitions=1, sleeper=lambda s: None
    ).collect()
    got = {r["key"]: r["body"] for r in rows}
    assert got == {"k1": "body:k1", "k2": "body:k2"}  # k3/k4 omitted


def test_flaky_transport_through_spark(spark):
    """Per-key deterministic flakiness (worker processes can't share
    state): 'bad' always fails -> NULL body after retries; good keys
    succeed; no real sleeping (injected no-op sleeper)."""
    keys = spark.createDataFrame([("good",), ("bad",)], "id_user string")

    def fetch(k):
        if k == "bad":
            raise RuntimeError("http 500")
        return f"body:{k}"

    got = {
        r["key"]: r["body"]
        for r in fetch_bodies(keys, fetch, sleeper=lambda s: None).collect()
    }
    assert got == {"good": "body:good", "bad": None}
