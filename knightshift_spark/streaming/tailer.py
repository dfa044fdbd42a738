"""Live HTTP PGN tailer: the production transport that feeds the spool
directory ``streaming.pgn_stream.stream_pgn_lines`` watches.

Engine twin of the reference's ingestion loop
(``ingestion/get_games_from_tv.py:122-199``), split at the right seam for
Spark: the NETWORK side (this module — a driver-side poll loop, no Spark
dependency) lands complete game blocks as atomic spool files; the DATA
side (Structured Streaming file source → sessionize → parse → merge)
stays fully distributed. The reference fused both into one row-at-a-time
process; here each side scales independently — run one tailer per
channel/region, and the streaming job doesn't care how many writers feed
the spool.

Reference semantics preserved:

- chunked GET per channel with up to 3 attempts and a 5 s backoff
  (``get_games_from_tv.py:155-176``); exhausted retries skip the channel
  for this poll (``:177-179`` returns, loop continues);
- HTTP 429 aborts the whole run immediately — no retry, no further
  channels (``:161-163`` calls ``sys.exit(1)``; the library form returns
  with ``stopped_on_429=True`` so the caller owns process exit);
- a game block is closed by the first move line (``"1. "`` prefix,
  ``:196-199``); only COMPLETE blocks are spooled — a partial tail block
  is carried per channel across polls, exactly like the reference's
  in-flight ``pgn_block`` buffer;
- poll loop: all channels, sleep ``sleep_interval_s``, repeat until
  ``time_limit_s`` (``:122-147``); after ``max_games`` games, cool off
  ``rate_limit_pause_s`` and reset the counter (``:137-141``).

Spool contract (``sources/pgn.py:read_pgn_lines`` writer-side
invariant): each file is a bounded batch of whole games, written to a
dot-prefixed temp name and atomically renamed — the Spark file source
ignores dotted files, so a half-written spool file can never enter a
micro-batch.

The transport is injectable: tests drive the tailer with canned byte
streams and fake clocks (no network, no sleeping); production uses
``http_lines_transport`` (stdlib urllib — chunked line iteration).
"""

from __future__ import annotations

import os
import time
import uuid
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field

from knightshift_spark.sources.rest import RateLimited

MOVE_PREFIX = b"1. "

# reference defaults (get_games_from_tv.py:58-61), env-overridable there
DEFAULT_TIME_LIMIT_S = 4.0
DEFAULT_SLEEP_INTERVAL_S = 5.0
DEFAULT_MAX_GAMES = 5000
DEFAULT_RATE_LIMIT_PAUSE_S = 900.0


def http_lines_transport(
    url: str,
    headers: dict[str, str] | None = None,
    timeout_s: float = 30.0,
    max_lines: int | None = 10_000,
) -> Iterator[bytes]:
    """Chunked HTTP GET yielding raw PGN lines (stdlib only).

    Status mapping mirrors the reference (``get_games_from_tv.py:
    160-176``): 429 → ``RateLimited`` (never retried); any other HTTP or
    URL error raises and the tailer's retry loop handles it. The TV
    stream is endless, so ``max_lines`` bounds one poll's read before the
    connection is closed (the reference instead holds the socket open
    forever inside one poll — a bounded read per poll is the same data in
    bounded memory).
    """
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers=headers or {})
    try:
        resp = urllib.request.urlopen(req, timeout=timeout_s)
    except urllib.error.HTTPError as e:
        if e.code == 429:
            raise RateLimited(f"429 from {url}") from e
        raise
    with resp:
        for i, raw in enumerate(resp):
            if max_lines is not None and i >= max_lines:
                break
            yield raw.rstrip(b"\r\n")


@dataclass
class TailerStats:
    games_spooled: int = 0
    files_written: int = 0
    polls: int = 0
    stopped_on_429: bool = False
    per_channel: dict[str, int] = field(default_factory=dict)


class PgnTailer:
    """Poll-loop tailer: fetch each channel's PGN stream, cut complete
    game blocks, land them as atomic spool files.

    ``transport(channel) -> Iterator[bytes]`` yields raw PGN lines for
    one poll of one channel (production:
    ``lambda ch: http_lines_transport(url_template.format(channel=ch))``).
    ``sleeper``/``clock`` are injectable so tests run instantly.
    """

    def __init__(
        self,
        spool_dir: str,
        channels: Iterable[str],
        transport: Callable[[str], Iterator[bytes]],
        *,
        time_limit_s: float = DEFAULT_TIME_LIMIT_S,
        sleep_interval_s: float = DEFAULT_SLEEP_INTERVAL_S,
        max_games: int = DEFAULT_MAX_GAMES,
        rate_limit_pause_s: float = DEFAULT_RATE_LIMIT_PAUSE_S,
        retry_attempts: int = 3,
        retry_backoff_s: float = 5.0,
        sleeper: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.spool_dir = spool_dir
        self.channels = list(channels)
        self.transport = transport
        self.time_limit_s = time_limit_s
        self.sleep_interval_s = sleep_interval_s
        self.max_games = max_games
        self.rate_limit_pause_s = rate_limit_pause_s
        self.retry_attempts = retry_attempts
        self.retry_backoff_s = retry_backoff_s
        self.sleeper = sleeper
        self.clock = clock
        # per-channel partial block carried across polls (the reference's
        # in-flight pgn_block buffer, get_games_from_tv.py:183-199)
        self._carry: dict[str, list[bytes]] = {}

    # -- one channel ------------------------------------------------------

    def _read_blocks(self, channel: str) -> list[list[bytes]]:
        """Consume one poll's lines; return COMPLETE blocks (move-line
        terminated). The unterminated tail stays in the carry buffer."""
        block: list[bytes] = self._carry.pop(channel, [])
        complete: list[list[bytes]] = []
        for raw in self.transport(channel):
            if not raw.strip():
                continue  # reference skips blank lines (:195)
            block.append(raw)
            if raw.strip().startswith(MOVE_PREFIX):
                complete.append(block)
                block = []
        if block:
            self._carry[channel] = block
        return complete

    def _poll_channel(self, channel: str) -> list[list[bytes]]:
        """Retry wrapper (reference ``:160-176``): up to ``retry_attempts``
        tries with backoff; RateLimited propagates (429 aborts the run);
        exhausted retries → no games this poll, channel retried next poll."""
        for attempt in range(1, self.retry_attempts + 1):
            try:
                return self._read_blocks(channel)
            except RateLimited:
                raise
            except Exception:
                if attempt < self.retry_attempts:
                    self.sleeper(self.retry_backoff_s)
        return []

    # -- spool ------------------------------------------------------------

    def _spool(self, blocks: list[list[bytes]]) -> None:
        """Write one poll's complete blocks as ONE spool file, atomically:
        dot-prefixed temp (invisible to the Spark file source) + rename."""
        if not blocks:
            return
        payload = b"\n".join(b"\n".join(block) for block in blocks) + b"\n"
        name = f"poll-{uuid.uuid4().hex}.pgn"
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        os.makedirs(self.spool_dir, exist_ok=True)
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.spool_dir, name))

    # -- main loop --------------------------------------------------------

    def run(self) -> TailerStats:
        """The reference poll loop (``get_games_from_tv.py:122-147``)."""
        stats = TailerStats()
        start = self.clock()
        total = 0
        while self.clock() - start < self.time_limit_s:
            stats.polls += 1
            batch: list[list[bytes]] = []
            try:
                for ch in self.channels:
                    blocks = self._poll_channel(ch)
                    stats.per_channel[ch] = stats.per_channel.get(ch, 0) + len(blocks)
                    batch.extend(blocks)
            except RateLimited:
                # spool what this poll completed before stopping — the
                # merge sink is idempotent, nothing is lost or doubled
                self._spool(batch)
                if batch:
                    stats.files_written += 1
                    stats.games_spooled += len(batch)
                stats.stopped_on_429 = True
                return stats
            self._spool(batch)
            if batch:
                stats.files_written += 1
                stats.games_spooled += len(batch)
            total += len(batch)
            if total >= self.max_games:
                self.sleeper(self.rate_limit_pause_s)  # cool-off (:137-141)
                total = 0
            self.sleeper(self.sleep_interval_s)
        return stats


def tail_tv_channels(
    spool_dir: str,
    channels: Iterable[str],
    url_template: str,
    headers: dict[str, str] | None = None,
    **kwargs,
) -> TailerStats:
    """Production entry: tail ``url_template.format(channel=...)`` for
    every channel into ``spool_dir``. Pair with ``run_pgn_stream`` over
    the same directory for live end-to-end ingestion."""
    tailer = PgnTailer(
        spool_dir,
        channels,
        lambda ch: http_lines_transport(url_template.format(channel=ch), headers),
        **kwargs,
    )
    return tailer.run()
