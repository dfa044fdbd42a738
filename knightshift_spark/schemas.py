"""Canonical StructType schemas (DDL-first, no inference).

Derived from the reference's version-controlled DDL:

- ``tv_channel_games``: reference ``schemas/init/2025-05-01__tv_channel_games.sql:3-28``
  (24 columns, PK ``id_game``). Postgres TIME has no Spark equivalent →
  canonical ``HH:mm:ss`` string (SURVEY.md §1.2).
- ``lichess_users``: reference ``schemas/init/2025-05-01__lichess_users.sql:2-30``
  (27 columns, PK ``id_user``); epoch-millis BIGINT for tm_created/tm_seen.
- ``USER_PROFILE_JSON``: the nested Lichess ``/api/user/{name}`` response as
  consumed by reference ``enrichment/backfill_user_profiles.py:178-214`` —
  parsed with ``from_json`` and flattened by column access.
"""

from __future__ import annotations

from pyspark.sql import types as T

TV_CHANNEL_GAMES = T.StructType(
    [
        T.StructField("id_game", T.StringType(), False),
        T.StructField("val_event_name", T.StringType(), True),
        T.StructField("val_site_url", T.StringType(), True),
        T.StructField("dt_game", T.DateType(), True),
        T.StructField("id_user_white", T.StringType(), True),
        T.StructField("id_user_black", T.StringType(), True),
        T.StructField("val_result", T.StringType(), True),
        T.StructField("dt_game_utc", T.DateType(), True),
        T.StructField("tm_game_utc", T.StringType(), True),  # TIME → "HH:mm:ss"
        T.StructField("val_elo_white", T.IntegerType(), True),
        T.StructField("val_elo_black", T.IntegerType(), True),
        T.StructField("val_title_white", T.StringType(), True),
        T.StructField("val_title_black", T.StringType(), True),
        T.StructField("val_variant", T.StringType(), True),
        T.StructField("val_time_control", T.StringType(), True),
        T.StructField("val_opening_eco_code", T.StringType(), True),
        T.StructField("val_opening_name", T.StringType(), True),
        T.StructField("val_termination", T.StringType(), True),
        T.StructField("val_moves_pgn", T.StringType(), True),
        T.StructField("tm_ingested", T.TimestampType(), True),
        T.StructField("tm_validated", T.TimestampType(), True),
        T.StructField("ind_validated", T.BooleanType(), True),
        T.StructField("val_validation_notes", T.StringType(), True),
        T.StructField("ind_profile_updated", T.BooleanType(), True),
    ]
)

LICHESS_USERS = T.StructType(
    [
        T.StructField("id_user", T.StringType(), False),
        T.StructField("val_username", T.StringType(), True),
        T.StructField("val_title", T.StringType(), True),
        T.StructField("val_url", T.StringType(), True),
        T.StructField("val_real_name", T.StringType(), True),
        T.StructField("val_location", T.StringType(), True),
        T.StructField("val_bio", T.StringType(), True),
        T.StructField("val_rating_fide", T.IntegerType(), True),
        T.StructField("val_rating_uscf", T.IntegerType(), True),
        T.StructField("val_rating_bullet", T.IntegerType(), True),
        T.StructField("val_rating_blitz", T.IntegerType(), True),
        T.StructField("val_rating_classical", T.IntegerType(), True),
        T.StructField("val_rating_rapid", T.IntegerType(), True),
        T.StructField("val_rating_chess960", T.IntegerType(), True),
        T.StructField("val_rating_ultra_bullet", T.IntegerType(), True),
        T.StructField("val_country_code", T.StringType(), True),
        T.StructField("tm_created", T.LongType(), True),  # epoch millis
        T.StructField("tm_seen", T.LongType(), True),  # epoch millis
        T.StructField("n_playtime_total", T.IntegerType(), True),
        T.StructField("n_playtime_tv", T.IntegerType(), True),
        T.StructField("n_games_all", T.IntegerType(), True),
        T.StructField("n_games_rated", T.IntegerType(), True),
        T.StructField("n_games_win", T.IntegerType(), True),
        T.StructField("n_games_loss", T.IntegerType(), True),
        T.StructField("n_games_draw", T.IntegerType(), True),
        T.StructField("ind_patron", T.BooleanType(), True),
        T.StructField("ind_streaming", T.BooleanType(), True),
    ]
)

_PERF = T.StructType([T.StructField("rating", T.IntegerType(), True)])

USER_PROFILE_JSON = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("username", T.StringType(), True),
        T.StructField("patron", T.StringType(), True),  # may arrive as "1"/"true"
        T.StructField("streaming", T.StringType(), True),
        T.StructField("createdAt", T.LongType(), True),
        T.StructField("seenAt", T.LongType(), True),
        T.StructField(
            "profile",
            T.StructType(
                [
                    T.StructField("title", T.StringType(), True),
                    T.StructField("url", T.StringType(), True),
                    T.StructField("realName", T.StringType(), True),
                    T.StructField("location", T.StringType(), True),
                    T.StructField("bio", T.StringType(), True),
                    T.StructField("fideRating", T.StringType(), True),
                    T.StructField("uscfRating", T.StringType(), True),
                    T.StructField("flag", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "perfs",
            T.StructType(
                [
                    T.StructField("bullet", _PERF, True),
                    T.StructField("blitz", _PERF, True),
                    T.StructField("classical", _PERF, True),
                    T.StructField("rapid", _PERF, True),
                    T.StructField("chess960", _PERF, True),
                    T.StructField("ultraBullet", _PERF, True),
                ]
            ),
            True,
        ),
        T.StructField(
            "playTime",
            T.StructType(
                [
                    T.StructField("total", T.IntegerType(), True),
                    T.StructField("tv", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "count",
            T.StructType(
                [
                    T.StructField("all", T.IntegerType(), True),
                    T.StructField("rated", T.IntegerType(), True),
                    T.StructField("win", T.IntegerType(), True),
                    T.StructField("loss", T.IntegerType(), True),
                    T.StructField("draw", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

# Raw PGN line feed: one row per text line plus provenance for ordering.
PGN_LINES = T.StructType(
    [
        T.StructField("line", T.StringType(), True),
        T.StructField("line_no", T.LongType(), False),
        T.StructField("src", T.StringType(), True),  # file / channel provenance
    ]
)

# Events stream table (driver testdata layout, TESTDATA.md): the static
# fallback schema when a streaming source is defined over a spool dir
# that has no files yet.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)
