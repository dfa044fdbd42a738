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
  ) AS t(id_user, val_username, val_fide_rating, val_real_name,
         val_rating_bullet, ind_patron, n_games_all, tm_created)
"""


@query(
    "q42_profile_flatten",
    oracle=_GOLDEN,
    doc="OP-21 nested JSON flatten with OP-20 sentinel cleaning vs golden rows",
)
def q42(spark: SparkSession, sf: str) -> DataFrame:  # sf unused: fixture input
    bodies = spark.createDataFrame(FIXTURE, "id_user string, body string")
    return flatten_profiles(bodies).select(
        "id_user",
        "val_username",
        "val_fide_rating",
        "val_real_name",
        "val_rating_bullet",
        "ind_patron",
        "n_games_all",
        "tm_created",
    )
