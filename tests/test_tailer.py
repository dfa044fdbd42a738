"""HTTP PGN tailer (OP-01 transport): offline tests via the injectable
transport seam — retry/backoff/429 semantics vs the reference loop
(``get_games_from_tv.py:122-199``), atomic spooling, partial-block carry,
and the tailer→streaming-source→merge end-to-end path."""

from __future__ import annotations

import os

import pytest

from knightshift_spark.sources.rest import RateLimited
from knightshift_spark.streaming.tailer import PgnTailer, TailerStats

G1 = [
    b'[Event "E1"]',
    b'[Site "https://lichess.org/tailG1"]',
    b'[White "u1"]',
    b'[Black "u2"]',
    b'[Result "1-0"]',
    b"1. e4 e5 1-0",
]
G2 = [
    b'[Event "E2"]',
    b'[Site "https://lichess.org/tailG2"]',
    b'[White "u3"]',
    b'[Black "u4"]',
    b'[Result "0-1"]',
    b"1. d4 d5 0-1",
]
PARTIAL = [b'[Event "E3"]', b'[Site "https://lichess.org/tailG3"]']  # no move line


class FakeClock:
    """Monotonic clock that only advances when the tailer sleeps — each
    run() iteration costs 'one sleep', so time_limit_s counts polls."""

    def __init__(self):
        self.t = 0.0

    def __call__(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.t += s


def one_poll_tailer(spool, transport, **kw):
    clock = FakeClock()
    defaults = dict(
        time_limit_s=1.0,      # one poll: first sleep(5) ends the loop
        sleep_interval_s=5.0,
        sleeper=clock.sleep,
        clock=clock,
        retry_backoff_s=5.0,
    )
    defaults.update(kw)
    return PgnTailer(str(spool), ["blitz"], transport, **defaults), clock


def test_spools_complete_blocks_only(tmp_path):
    spool = tmp_path / "spool"
    tailer, _ = one_poll_tailer(spool, lambda ch: iter(G1 + G2 + PARTIAL))
    stats = tailer.run()
    assert stats.games_spooled == 2 and stats.files_written == 1
    files = os.listdir(spool)
    assert len(files) == 1 and not files[0].startswith(".")  # atomic rename
    text = (spool / files[0]).read_text()
    assert "tailG1" in text and "tailG2" in text
    assert "tailG3" not in text  # unterminated block carried, not spooled


def test_partial_block_carries_across_polls(tmp_path):
    """A block split across two polls (stream cut mid-game) is assembled
    when its move line arrives in the next poll — the reference's
    in-flight buffer behavior."""
    spool = tmp_path / "spool"
    polls = [iter(G1 + PARTIAL), iter([b"1. c4 c5 1/2-1/2"])]
    tailer, _ = one_poll_tailer(
        spool, lambda ch: polls.pop(0), time_limit_s=7.0  # two polls
    )
    stats = tailer.run()
    assert stats.games_spooled == 2  # G1, then the reassembled G3
    joined = "".join((spool / f).read_text() for f in sorted(os.listdir(spool)))
    assert "tailG3" in joined and "1. c4 c5" in joined


def test_transient_errors_retry_then_succeed(tmp_path):
    calls = []

    def transport(ch):
        calls.append(ch)
        if len(calls) < 3:
            raise RuntimeError("http 503")
        return iter(G1)

    tailer, clock = one_poll_tailer(tmp_path / "spool", transport)
    stats = tailer.run()
    assert stats.games_spooled == 1
    assert len(calls) == 3  # reference: 3 attempts with 5 s backoff
    assert clock.t >= 2 * 5.0  # two backoff sleeps happened


def test_exhausted_retries_skip_channel_not_run(tmp_path):
    def transport(ch):
        raise RuntimeError("http 500")

    tailer, _ = one_poll_tailer(tmp_path / "spool", transport)
    stats = tailer.run()
    assert stats.games_spooled == 0 and stats.polls == 1
    assert not stats.stopped_on_429  # run completed; channel just yielded nothing


def test_429_aborts_run_keeps_prior_channels(tmp_path):
    """429 on the second channel: the first channel's games from this poll
    are still spooled (idempotent merge downstream), then the run stops —
    the reference's exit-on-429 in library form."""
    spool = tmp_path / "spool"

    def transport(ch):
        if ch == "bullet":
            raise RateLimited("429")
        return iter(G1)

    clock = FakeClock()
    tailer = PgnTailer(
        str(spool), ["blitz", "bullet"], transport,
        time_limit_s=100.0, sleeper=clock.sleep, clock=clock,
    )
    stats = tailer.run()
    assert stats.stopped_on_429
    assert stats.polls == 1  # no second poll after 429
    assert stats.games_spooled == 1  # blitz's game survived
    assert len(os.listdir(spool)) == 1


def test_max_games_cooloff(tmp_path):
    """Hitting max_games triggers the rate-limit pause and resets the
    counter (reference :137-141)."""
    sleeps: list[float] = []
    clock = FakeClock()

    def sleeper(s):
        sleeps.append(s)
        clock.sleep(s)

    tailer = PgnTailer(
        str(tmp_path / "spool"), ["blitz"], lambda ch: iter(G1 + G2),
        time_limit_s=6.0, sleep_interval_s=5.0, max_games=2,
        rate_limit_pause_s=900.0, sleeper=sleeper, clock=clock,
    )
    tailer.run()
    assert 900.0 in sleeps  # cool-off fired after reaching max_games


def test_tailer_feeds_streaming_merge_end_to_end(spark, tmp_path):
    """The full OP-01 path: tailer spools → Structured Streaming source →
    sessionize/parse/merge → parquet table, with a cross-poll UPDATE of
    the same game id winning the merge."""
    from knightshift_spark.streaming.pgn_stream import run_pgn_stream

    spool = tmp_path / "spool"
    g1_v2 = [
        b'[Event "E1 updated"]',
        b'[Site "https://lichess.org/tailG1"]',
        b'[White "u1"]',
        b'[Black "u2"]',
        b'[Result "1/2-1/2"]',
        b"1. e4 e5 2. Nf3 1/2-1/2",
    ]
    polls = [iter(G1 + G2), iter(g1_v2)]
    tailer, _ = one_poll_tailer(spool, lambda ch: polls.pop(0), time_limit_s=7.0)
    stats = tailer.run()
    assert stats.games_spooled == 3 and stats.files_written == 2

    # spool files arrive over time; pin mtime order for a deterministic
    # micro-batch sequence (file source orders by modification time)
    fs = sorted(spool.glob("*.pgn"), key=lambda p: p.stat().st_mtime)
    now = fs[0].stat().st_mtime
    for i, f in enumerate(fs):
        os.utime(f, (now + 60 * i, now + 60 * i))

    target = str(tmp_path / "games")
    q = run_pgn_stream(
        spark, str(spool), target, str(tmp_path / "ckpt"),
        trigger={"availableNow": True}, max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    out = {r["id_game"]: r for r in spark.read.parquet(target).collect()}
    assert sorted(out) == ["tailG1", "tailG2"]
    assert out["tailG1"]["val_event_name"] == "E1 updated"  # later poll won


def test_midrun_kill_restart_exactly_once(spark, tmp_path):
    """Kill the stream after the FIRST of three spool files, restart on
    the same checkpoint: already-merged games are not re-ingested (their
    tm_ingested is unchanged) and the remaining files merge — the
    exactly-once effect of checkpoint + idempotent merge."""
    from knightshift_spark.streaming.pgn_stream import run_pgn_stream

    spool = tmp_path / "spool"
    spool.mkdir()
    texts = {
        "a.pgn": "\n".join(ln.decode() for ln in G1) + "\n",
        "b.pgn": "\n".join(ln.decode() for ln in G2) + "\n",
        "c.pgn": "\n".join(
            ln.decode()
            for ln in [
                b'[Event "E1 updated"]',
                b'[Site "https://lichess.org/tailG1"]',
                b'[Result "1/2-1/2"]',
                b"1. e4 e5 2. Nf3 1/2-1/2",
            ]
        ) + "\n",
    }
    for i, (name, text) in enumerate(sorted(texts.items())):
        p = spool / name
        p.write_text(text)
        base = p.stat().st_mtime
        os.utime(p, (base + 60 * i, base + 60 * i))

    target, ckpt = str(tmp_path / "t"), str(tmp_path / "c")
    # first run: one file per trigger, live trigger; kill after batch 0
    import threading

    first_batch_done = threading.Event()
    q = run_pgn_stream(
        spark, str(spool), target, ckpt,
        trigger={"processingTime": "1 second"}, max_files_per_trigger=1,
        on_batch=lambda bid, n: first_batch_done.set(),
    )
    assert first_batch_done.wait(120)
    q.stop()  # mid-run kill: files b/c not yet (fully) processed
    q.awaitTermination(60)

    merged_now = {r["id_game"]: r for r in spark.read.parquet(target).collect()}
    assert "tailG1" in merged_now  # first file landed
    ts_g1_before = merged_now["tailG1"]["tm_ingested"]

    # restart on the same checkpoint: drain everything remaining
    q2 = run_pgn_stream(
        spark, str(spool), target, ckpt,
        trigger={"availableNow": True}, max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    out = {r["id_game"]: r for r in spark.read.parquet(target).collect()}
    assert sorted(out) == ["tailG1", "tailG2"]
    assert out["tailG1"]["val_result"] == "1/2-1/2"  # c.pgn update applied
    assert out["tailG2"]["val_result"] == "0-1"
    # a.pgn was NOT replayed: tailG1's first-ingest timestamp only moved
    # forward via the c.pgn update, and tailG2 ingested exactly once
    assert out["tailG1"]["tm_ingested"] >= ts_g1_before


def test_http_transport_maps_429(monkeypatch):
    """The stdlib transport raises RateLimited on HTTP 429 and lets other
    HTTP errors propagate for the retry loop — no network involved."""
    import io
    import urllib.error
    import urllib.request

    from knightshift_spark.streaming.tailer import http_lines_transport

    def fake_urlopen_429(req, timeout=None):
        raise urllib.error.HTTPError(req.full_url, 429, "too many", {}, io.BytesIO())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen_429)
    with pytest.raises(RateLimited):
        next(http_lines_transport("http://example.invalid/tv"))

    def fake_urlopen_500(req, timeout=None):
        raise urllib.error.HTTPError(req.full_url, 500, "boom", {}, io.BytesIO())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen_500)
    with pytest.raises(urllib.error.HTTPError):
        next(http_lines_transport("http://example.invalid/tv"))


def test_http_transport_yields_lines(monkeypatch):
    import io
    import urllib.request

    from knightshift_spark.streaming.tailer import http_lines_transport

    body = b"\r\n".join(G1) + b"\n"  # CRLF line endings, like a real server

    def fake_urlopen(req, timeout=None):
        return io.BytesIO(body)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    lines = list(http_lines_transport("http://example.invalid/tv"))
    assert lines == G1  # CRLF/LF stripped, order preserved
