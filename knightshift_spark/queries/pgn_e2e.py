"""Q28: PGN end-to-end pipeline over the embedded fixture (FIXTURES.md §3).

Runs the full reference-equivalent capability chain in one declared query:
line feed → sessionize (OP-02) → header parse (OP-10) → typed projection
with try-casts (OP-11..OP-16) → last-writer-wins upsert on id_game
(OP-06/OP-31) → validate/normalize/delete (OP-17..OP-26).

The oracle is a hand-computed golden VALUES table: the driver compares the
engine's pipeline output against it row-for-row. Fixture edge cases:
no-Site block (dropped), bad date/time/elo (NULL), duplicate id_game
(last wins), missing required field / bad result (deleted), dirty titles,
``Time forfeit``/``UNTERMINATED`` recodes, ECO ``"?"`` (NULL + note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knightshift_spark.pipelines.clean import clean_games
from knightshift_spark.pipelines.ingest import ingest_games
from knightshift_spark.queries import query
from knightshift_spark.sources import pgn

PGN_FIXTURE = """\
[Event "Rated Blitz Game"]
[Site "https://lichess.org/abc123XY"]
[Date "2025.05.01"]
[White "user1"]
[Black "user2"]
[Result "1-0"]
[UTCDate "2025.05.01"]
[UTCTime "17:40:12"]
[WhiteElo "1732"]
[BlackElo "1688"]
[WhiteTitle "FM"]
[Variant "Standard"]
[TimeControl "180+0"]
[ECO "C20"]
[Opening "King's Pawn Game"]
[Termination "Normal"]
1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 1-0
[Event "Rated Bullet Game"]
[Site "https://lichess.org/def456ZW"]
[Date "2025.13.99"]
[White "user3"]
[Black "user4"]
[Result "0-1"]
[UTCTime "25:99:00"]
[WhiteElo "abc"]
[WhiteTitle " gm "]
[Termination "Time forfeit"]
[ECO "?"]
1. d4 d5 0-1
[Event "No Site Game"]
[White "ghost1"]
[Black "ghost2"]
[Result "1-0"]
1. e4 1-0
[Event "Missing Black"]
[Site "https://lichess.org/ghi789AB"]
[White "user7"]
[Result "1-0"]
[Termination "Normal"]
1. e4 c5 1-0
[Event "Bad Result"]
[Site "https://lichess.org/jkl012CD"]
[White "user8"]
[Black "user9"]
[Result "*"]
[Termination "Normal"]
1. e4 e6 *
[Event "Rated Blitz Game 2"]
[Site "https://lichess.org/abc123XY"]
[Date "2025.05.02"]
[White "user1"]
[Black "user2"]
[Result "1/2-1/2"]
[ECO "C21"]
[Termination "UNTERMINATED"]
1. e4 e5 1/2-1/2
[Event "Classical Clash"]
[Site "https://lichess.org/mno345EF"]
[Date "2025.05.03"]
[White "user5"]
[Black "user6"]
[Result "1/2-1/2"]
[UTCDate "2025.05.03"]
[UTCTime "09:15:00"]
[WhiteElo "2000"]
[BlackElo "2100"]
[WhiteTitle "unranked"]
[BlackTitle "im"]
[Variant "Standard"]
[TimeControl "600+5"]
[ECO "C50"]
[Opening "Italian Game"]
[Termination "resigned"]
1. e4 e5 2. Nf3 Nc6 3. Bc4 1/2-1/2
"""

_OUT_COLS = (
    "id_game",
    "id_user_white",
    "id_user_black",
    "val_result",
    "dt_game",
    "tm_game_utc",
    "val_elo_white",
    "val_elo_black",
    "val_title_white",
    "val_title_black",
    "val_termination",
    "val_opening_eco_code",
    "val_validation_notes",
)

_GOLDEN = """
  SELECT * FROM (VALUES
    ('abc123XY', 'user1', 'user2', '1/2-1/2', DATE '2025-05-02',
     CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS INT),
     'None', 'None', 'NORMAL', 'C21', 'Valid'),
    ('def456ZW', 'user3', 'user4', '0-1', CAST(NULL AS DATE),
     CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS INT),
     'GM', 'None', 'TIME_FORFEIT', CAST(NULL AS VARCHAR), 'eco unknown'),
    ('mno345EF', 'user5', 'user6', '1/2-1/2', DATE '2025-05-03',
     '09:15:00', 2000, 2100,
     'None', 'IM', 'RESIGNED', 'C50', 'Valid')
  ) AS t(id_game, id_user_white, id_user_black, val_result, dt_game,
         tm_game_utc, val_elo_white, val_elo_black, val_title_white,
         val_title_black, val_termination, val_opening_eco_code,
         val_validation_notes)
"""


def run_pgn_pipeline(spark: SparkSession, pgn_text: str = PGN_FIXTURE) -> DataFrame:
    """The full ingest+clean pipeline over a PGN text blob.

    Requires ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (pinned in
    session.RUNTIME_CONFS via get_spark/tune_session — duplicate PGN tags
    overwrite, reference ``utils/pgn_parser.py:33-36``)."""
    lines = pgn.lines_from_text(spark, pgn_text)
    games = pgn.assemble_games(pgn.sessionize(lines))
    rows = ingest_games(games)
    cleaned = clean_games(rows)
    return cleaned.valid.select(*_OUT_COLS)


@query(
    "q28_pgn_pipeline",
    oracle=_GOLDEN,
    doc="PGN-shaped E2E: parse → project → upsert → validate vs golden rows",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:  # sf unused: fixture input
    return run_pgn_pipeline(spark)


# Former q55_games_per_result (which itself had absorbed
# q56_title_matchups) folded into q28_pgn_pipeline: q28 hash-checks the
# ENTIRE cleaned games relation against the golden rows, and q55 was a
# pure GROUP BY + conditional count over exactly those hash-checked rows
# — both aggregate shapes are independently oracle-checked elsewhere
# (q48 conditional agg, q08 count), so no operator or oracle coverage is
# lost (COVERAGE.md fusion map). Its rollup survives as
# ``games_per_result`` below for library users; the slot funds the
# round-7 fuzzy-join declaration (q69).


def games_per_result(games: DataFrame) -> DataFrame:
    """Result × title-pair distribution with a conditional rated count —
    the q55 analytics rollup, kept as a library helper."""
    return games.groupBy("val_result", "val_title_white", "val_title_black").agg(
        F.count(F.lit(1)).cast("int").alias("n_games"),
        F.count(F.when(F.col("val_elo_white").isNotNull(), 1))
        .cast("int")
        .alias("n_rated"),
    )
