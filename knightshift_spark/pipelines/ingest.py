"""Ingestion pipeline: PGN game blocks → ``tv_channel_games`` rows.

Mirrors the reference's ``build_game_data`` projection
(``db/game_upsert.py:59-81``): 19 data columns built from the PGN header
dict, missing strings → ``""``, ints/dates/times → NULL on garbage
(try-cast, ``game_upsert.py:21-51``), ``id_game`` from the tail of the
Site URL (``game_upsert.py:61``), ingest timestamp per row
(``game_upsert.py:80``). Followed by last-writer-wins dedup on
``id_game`` — the algebraic equivalent of the reference's per-row upsert
(``game_upsert.py:84-110``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knightshift_spark.functions.cleaning import (
    blank_to_default,
    game_id_from_url,
    parse_pgn_date,
    parse_pgn_time,
    safe_int,
)
from knightshift_spark.operators.merge import last_writer_wins


def _h(name: str) -> Column:
    return F.col("headers").getItem(name)


def project_game_rows(
    games: DataFrame,
    ingest_ts: Column | None = None,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """PGN block rows (headers map + moves) → typed game rows.

    ``ingest_ts`` defaults to ``current_timestamp()``; tests inject a
    deterministic column (the reference stamps ``datetime.utcnow()``).
    ``keep`` carries extra input columns through (e.g. the block sequence
    used as the upsert ordering key).
    """
    if ingest_ts is None:
        ingest_ts = F.current_timestamp()
    site = _h("site")
    df = games.filter(site.isNotNull() & (F.trim(site) != "")).select(
        *[F.col(c) for c in keep],
        game_id_from_url(site).alias("id_game"),
        blank_to_default(_h("event")).alias("val_event_name"),
        blank_to_default(site).alias("val_site_url"),
        parse_pgn_date(_h("date")).alias("dt_game"),
        blank_to_default(_h("white")).alias("id_user_white"),
        blank_to_default(_h("black")).alias("id_user_black"),
        blank_to_default(_h("result")).alias("val_result"),
        parse_pgn_date(_h("utcdate")).alias("dt_game_utc"),
        parse_pgn_time(_h("utctime")).alias("tm_game_utc"),
        safe_int(_h("whiteelo")).alias("val_elo_white"),
        safe_int(_h("blackelo")).alias("val_elo_black"),
        _h("whitetitle").alias("val_title_white"),
        _h("blacktitle").alias("val_title_black"),
        blank_to_default(_h("variant")).alias("val_variant"),
        blank_to_default(_h("timecontrol")).alias("val_time_control"),
        blank_to_default(_h("eco")).alias("val_opening_eco_code"),
        _h("opening").alias("val_opening_name"),
        blank_to_default(_h("termination")).alias("val_termination"),
        blank_to_default(F.col("moves")).alias("val_moves_pgn"),
        ingest_ts.alias("tm_ingested"),
        F.lit(None).cast("timestamp").alias("tm_validated"),
        F.lit(False).alias("ind_validated"),
        F.lit(None).cast("string").alias("val_validation_notes"),
        F.lit(False).alias("ind_profile_updated"),
    )
    return df


def ingest_games(games: DataFrame, ingest_ts: Column | None = None, order_col: str = "game_seq") -> DataFrame:
    """Full ingestion: project + last-writer-wins on ``id_game``.

    ``order_col`` (the block sequence within a source) breaks ties the
    same way the reference does: the most recently seen version of a game
    id wins (``game_upsert.py:84-110``).
    """
    rows = project_game_rows(games, ingest_ts, keep=(order_col,))
    return last_writer_wins(rows, ["id_game"], [order_col]).drop(order_col)
