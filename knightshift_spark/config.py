"""Environment-driven configuration — engine twin of the reference's
``utils/db_utils.py`` env/secrets loading and the env-overridable pacing
knobs (``get_games_from_tv.py:58-61``, ``backfill_user_profiles.py:112-117``).

Everything has a safe default; nothing reads files outside the repo.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field


def _f(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


@dataclass(frozen=True)
class EngineConfig:
    # ingestion pacing (reference TIME_LIMIT / SLEEP_INTERVAL / MAX_GAMES)
    trigger_interval_s: float = field(default_factory=lambda: _f("KS_TRIGGER_INTERVAL_S", 5.0))
    max_files_per_trigger: int = field(default_factory=lambda: int(_f("KS_MAX_FILES_PER_TRIGGER", 1)))
    # enrichment pacing (reference TIME_PER_USER / TIME_PER_GAME)
    seconds_per_fetch: float = field(default_factory=lambda: _f("KS_SECONDS_PER_FETCH", 0.5))
    fetch_partitions: int = field(default_factory=lambda: int(_f("KS_FETCH_PARTITIONS", 8)))
    # JDBC sink (reference db_utils env lookups; never hardcode secrets)
    jdbc_url: str | None = field(default_factory=lambda: os.environ.get("KS_JDBC_URL"))
    jdbc_user: str | None = field(default_factory=lambda: os.environ.get("KS_JDBC_USER"))
    jdbc_password: str | None = field(default_factory=lambda: os.environ.get("KS_JDBC_PASSWORD"))


def load_config(
    credentials_provider: Callable[[str], str | None] | None = None,
) -> EngineConfig:
    """Build the engine config from the environment, optionally routing
    SECRETS through a pluggable provider first.

    ``credentials_provider`` is the deployment seam for a cloud secrets
    manager (the reference pulls DB creds from one in
    ``utils/db_utils.py``): a callable ``name -> value | None`` consulted
    for each secret-bearing key before the environment. Returning ``None``
    falls back to the env var of the same name, so a provider can cover
    only the keys it owns. Non-secret knobs (pacing, partitions) stay
    env-only — they are tuning, not credentials.
    """
    if credentials_provider is None:
        return EngineConfig()

    def get(name: str) -> str | None:
        v = credentials_provider(name)
        return v if v is not None else os.environ.get(name)

    return EngineConfig(
        jdbc_url=get("KS_JDBC_URL"),
        jdbc_user=get("KS_JDBC_USER"),
        jdbc_password=get("KS_JDBC_PASSWORD"),
    )
