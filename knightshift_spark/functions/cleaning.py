"""Cleaning / normalization column functions.

Each function mirrors a per-row Python helper in the reference, but as a
pure Catalyst ``Column`` expression so it stays inside whole-stage codegen
(no Python in the hot path — SURVEY.md §2.6). Reference citations are on
each function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Canonical termination values (reference cleaning/validate_tv_channel_games.py:50)
VALID_TERMINATIONS = ("NORMAL", "TIME_FORFEIT", "RESIGNED", "ABANDONED")
# Allowed results (reference validate_tv_channel_games.py:49)
VALID_RESULTS = ("1-0", "0-1", "1/2-1/2")


def safe_int(c: Column) -> Column:
    """``int(v)`` else NULL — reference ``db/game_upsert.py:21-29``.

    ``try_cast`` keeps NULL-on-garbage semantics even on ANSI sessions.
    """
    return F.trim(c).try_cast("int")


def parse_pgn_date(c: Column) -> Column:
    """``%Y.%m.%d`` → date else NULL — reference ``game_upsert.py:32-40``.

    ``to_date`` returns NULL on parse failure in non-ANSI mode; wrap in
    try_to_timestamp-equivalent guard so ANSI sessions behave the same.
    """
    return F.try_to_timestamp(c, F.lit("yyyy.MM.dd")).cast("date")


def parse_pgn_time(c: Column) -> Column:
    """``%H:%M:%S`` → canonical ``HH:mm:ss`` string else NULL —
    reference ``game_upsert.py:43-51``; TIME type decision SURVEY.md §1.2."""
    return F.date_format(F.try_to_timestamp(c, F.lit("HH:mm:ss")), "HH:mm:ss")


def blank_to_default(c: Column, default: str = "") -> Column:
    """Missing string → default — reference ``game_upsert.py:59-81`` fills
    absent PGN headers with ``""``."""
    return F.coalesce(c, F.lit(default))


def game_id_from_url(site: Column) -> Column:
    """``site.split("/")[-1]`` — reference ``game_upsert.py:61``."""
    return F.element_at(F.split(site, "/"), -1)


def normalize_title(c: Column) -> Column:
    """NULL / ``none`` / ``unranked`` (case-insensitive, trimmed) → ``"None"``;
    else trim+upper — reference ``validate_tv_channel_games.py:78-83``."""
    t = F.trim(c)
    return F.when(
        c.isNull() | (t == "") | F.lower(t).isin("none", "unranked"), F.lit("None")
    ).otherwise(F.upper(t))


def eco_nullif_unknown(c: Column) -> Column:
    """ECO sentinel ``"?"`` → NULL — reference ``validate_tv_channel_games.py:125-131``."""
    return F.nullif(F.trim(c), F.lit("?"))


def canonicalize_termination(c: Column) -> Column:
    """Dictionary recode — reference ``validate_tv_channel_games.py:50,134-141``:
    upper+trim; ``TIME FORFEIT``→``TIME_FORFEIT``; ``UNTERMINATED``→``NORMAL``;
    members of the canon pass; anything else → ``NORMAL``."""
    t = F.upper(F.trim(c))
    t = F.when(t == "TIME FORFEIT", F.lit("TIME_FORFEIT")).otherwise(t)
    t = F.when(t == "UNTERMINATED", F.lit("NORMAL")).otherwise(t)
    return F.when(t.isin(*VALID_TERMINATIONS), t).otherwise(F.lit("NORMAL"))


def null_sentinel_to_null(c: Column) -> Column:
    """``"<null>"/"null"/"none"/""`` (case-insensitive) → NULL; else trimmed —
    reference ``enrichment/backfill_user_profiles.py:156-166``."""
    t = F.trim(c)
    return F.when(F.lower(t).isin("<null>", "null", "none", "") | c.isNull(), F.lit(None)).otherwise(t)


def bool_from_str(c: Column) -> Column:
    """Truthy strings ``"true"/"1"`` → true, NULL-sentinels → NULL, else false —
    reference ``backfill_user_profiles.py:156-166`` typed coercion."""
    cleaned = null_sentinel_to_null(c)
    return F.when(cleaned.isNull(), F.lit(None).cast("boolean")).otherwise(
        F.lower(cleaned).isin("true", "1")
    )


def is_missing(c: Column) -> Column:
    """Falsy check used by required-field validation — the reference treats
    both NULL and ``""`` as missing (``validate_tv_channel_games.py:66``)."""
    return c.isNull() | (F.trim(c) == "")


def validation_notes(*note_cols: Column) -> Column:
    """Accumulate rule messages; join ``", "``; default ``"Valid"`` —
    reference ``validate_tv_channel_games.py:103-155``.

    Each ``note_col`` is a ``when(cond, lit("msg"))`` (NULL when rule passes).
    """
    joined = F.concat_ws(", ", *note_cols)
    return F.coalesce(F.nullif(joined, F.lit("")), F.lit("Valid"))
