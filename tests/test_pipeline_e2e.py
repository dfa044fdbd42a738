"""Q28 golden test: full PGN ingest+clean pipeline vs hand-computed rows,
plus deleted-row accounting (reference OP-07/OP-33)."""

from __future__ import annotations

import datetime

from knightshift_spark.pipelines.clean import clean_games
from knightshift_spark.pipelines.ingest import ingest_games
from knightshift_spark.queries.pgn_e2e import PGN_FIXTURE, run_pgn_pipeline
from knightshift_spark.sources import pgn


def test_golden_rows(spark):
    rows = {r["id_game"]: r for r in run_pgn_pipeline(spark).collect()}
    assert sorted(rows) == ["abc123XY", "def456ZW", "mno345EF"]

    a = rows["abc123XY"]  # duplicate id: later block won
    assert a["val_result"] == "1/2-1/2"
    assert a["dt_game"] == datetime.date(2025, 5, 2)
    assert a["val_opening_eco_code"] == "C21"
    assert a["val_termination"] == "NORMAL"  # UNTERMINATED recode
    assert a["val_title_white"] == "None"
    assert a["val_validation_notes"] == "Valid"

    d = rows["def456ZW"]
    assert d["dt_game"] is None  # 2025.13.99
    assert d["tm_game_utc"] is None  # 25:99:00
    assert d["val_elo_white"] is None  # "abc"
    assert d["val_title_white"] == "GM"  # " gm "
    assert d["val_termination"] == "TIME_FORFEIT"
    assert d["val_opening_eco_code"] is None  # "?"
    assert d["val_validation_notes"] == "eco unknown"

    m = rows["mno345EF"]
    assert m["tm_game_utc"] == "09:15:00"
    assert (m["val_elo_white"], m["val_elo_black"]) == (2000, 2100)
    assert (m["val_title_white"], m["val_title_black"]) == ("None", "IM")
    assert m["val_termination"] == "RESIGNED"


def test_deleted_accounting(spark):
    lines = pgn.lines_from_text(spark, PGN_FIXTURE)
    games = pgn.assemble_games(pgn.sessionize(lines))
    rows = ingest_games(games)
    res = clean_games(rows)
    deleted = sorted(r["id_game"] for r in res.deleted.collect())
    # ghi789AB: missing black (required); jkl012CD: result "*"
    assert deleted == ["ghi789AB", "jkl012CD"]
    # batch counters (OP-33): valid + deleted = ingested distinct games
    assert res.valid.count() + res.deleted.count() == rows.count()


def test_force_revalidation(spark):
    """force=True re-normalizes rows already flagged valid
    (reference FORCE_REVALIDATE, validate_tv_channel_games.py:86-95)."""
    from pyspark.sql import functions as F

    lines = pgn.lines_from_text(spark, PGN_FIXTURE)
    games = pgn.assemble_games(pgn.sessionize(lines))
    rows = ingest_games(games)
    first = clean_games(rows).valid
    # NB: corrupting termination/eco would re-trigger the revalidation
    # predicate by itself (that's its job); titles are NOT part of the
    # predicate, so a dirty title on a validated row only normalizes
    # under force=True.
    dirty = first.withColumn(
        "val_title_white",
        F.when(F.col("id_game") == "mno345EF", " gm ").otherwise(
            F.col("val_title_white")
        ),
    )
    skipped = clean_games(dirty).valid
    forced = clean_games(dirty, force=True).valid
    get = lambda df: {r["id_game"]: r["val_title_white"] for r in df.collect()}
    assert get(skipped)["mno345EF"] == " gm "  # untouched (predicate skips)
    assert get(forced)["mno345EF"] == "GM"  # force renormalizes
