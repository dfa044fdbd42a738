"""Q42: nested-JSON profile flatten (OP-20/OP-21) as a declared query.

Runs ``pipelines.enrich.flatten_profiles`` over an embedded fixture of
Lichess-shaped profile JSON (FIXTURES.md §4) — ``from_json`` + struct
access + sentinel cleaning + typed coercion — checked against a
hand-computed golden VALUES oracle.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knightshift_spark.pipelines.enrich import flatten_profiles
from knightshift_spark.queries import query

_P1 = {
    "id": "user1",
    "username": "User1",
    "patron": "true",
    "streaming": "0",
    "createdAt": 1577836800000,
    "seenAt": 1746000000000,
    "profile": {
        "title": "FM",
        "realName": "<null>",
        "location": "Paris",
        "bio": "",
        "fideRating": "2100",
        "flag": "FR",
    },
    "perfs": {"bullet": {"rating": 2300}, "blitz": {"rating": 2250}},
    "playTime": {"total": 360000, "tv": 1200},
    "count": {"all": 5000, "rated": 4200, "win": 2600, "loss": 2000, "draw": 400},
}
_P2 = {
    "id": "user2",
    "username": "  User2  ",
    "patron": "0",
    "profile": {"realName": "Bob", "fideRating": "abc"},
}
_P3 = {"oops": "no id field"}  # skipped (reference backfill_user_profiles.py:240-241)

FIXTURE = [("user1", json.dumps(_P1)), ("user2", json.dumps(_P2)), ("user3", json.dumps(_P3))]

_GOLDEN = """
  SELECT * FROM (VALUES
    ('user1', 'User1', 2100, CAST(NULL AS VARCHAR), 2300, true, 5000, 1577836800000),
    ('user2', 'User2', CAST(NULL AS INT), 'Bob', CAST(NULL AS INT), false,
     CAST(NULL AS INT), CAST(NULL AS BIGINT))
  ) AS t(id_user, val_username, val_rating_fide, val_real_name,
         val_rating_bullet, ind_patron, n_games_all, tm_created)
"""


_GAMES_FIXTURE = [
    ("g1", "?", None, None, 1500),
    ("g2", "C20", "King's Pawn Game", 1700, 1600),
    ("g3", None, "Sicilian Defense", None, None),
]
_BODIES_FIXTURE = [
    ("g1", '[ECO "B01"]\n[Opening "Scandinavian Defense"]\n[WhiteElo "1850"]\n[BlackElo ""]'),
    ("g3", '[ECO "?"]\n[Opening "Sicilian Defense"]\n[WhiteElo "2200"]\n[BlackElo "2250"]'),
]

_OPENINGS_GOLDEN = """
  SELECT * FROM (VALUES
    ('g1', 'B01', 'Scandinavian Defense', 1850, 1500),
    ('g2', 'C20', 'King''s Pawn Game', 1700, 1600),
    ('g3', CAST(NULL AS VARCHAR), 'Sicilian Defense', 2200, 2250)
  ) AS t(id_game, val_opening_eco_code, val_opening_name,
         val_elo_white, val_elo_black)
"""


@query(
    "q63_opening_backfill",
    oracle=_OPENINGS_GOLDEN,
    doc="OP-05/OP-22/OP-27 opening backfill: predicate-scoped merge of "
        "fetched PGN-export tags (fetched NULL keeps current; '?' stays "
        "NULL) vs golden rows",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:  # sf unused: fixture input
    from knightshift_spark.pipelines.enrich import backfill_openings
    from knightshift_spark.plans.localrel import local_relation

    games = local_relation(
        spark,
        _GAMES_FIXTURE,
        "id_game string, val_opening_eco_code string, val_opening_name string, "
        "val_elo_white int, val_elo_black int",
    )
    bodies = local_relation(spark, _BODIES_FIXTURE, "id_game string, body string")
    return backfill_openings(games, bodies)


@query(
    "q42_profile_flatten",
    oracle=_GOLDEN,
    doc="OP-21 nested JSON flatten with OP-20 sentinel cleaning vs golden rows",
)
def q42(spark: SparkSession, sf: str) -> DataFrame:  # sf unused: fixture input
    from knightshift_spark.plans.localrel import local_relation

    bodies = local_relation(spark, FIXTURE, "id_user string, body string")
    return flatten_profiles(bodies).select(
        "id_user",
        "val_username",
        "val_rating_fide",
        "val_real_name",
        "val_rating_bullet",
        "ind_patron",
        "n_games_all",
        "tm_created",
    )
