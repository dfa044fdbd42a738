"""PGN source tests: sessionization boundaries, header parsing, edge cases
(reference grammar: utils/pgn_parser.py, block rule get_games_from_tv.py:196-199)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knightshift_spark.sources import pgn

FIX = """\
[Event "A"]
[Site "https://lichess.org/g1"]
[White "u1"]
1. e4 e5 1-0
[Event "B with spaces in value"]
[Site "https://lichess.org/g2"]
[Weird "va[l]ue"]
1. d4 d5 0-1
[Event "No Site"]
1. c4 1/2-1/2
"""


def _games(spark, text=FIX):
    lines = pgn.lines_from_text(spark, text)
    return pgn.assemble_games(pgn.sessionize(lines)).collect()


def test_block_boundaries(spark):
    games = _games(spark)
    # third block has no Site → dropped
    assert sorted(g["headers"]["site"] for g in games) == [
        "https://lichess.org/g1",
        "https://lichess.org/g2",
    ]


def test_headers_lowercased_and_values_kept(spark):
    g2 = next(g for g in _games(spark) if g["headers"]["site"].endswith("g2"))
    assert g2["headers"]["event"] == "B with spaces in value"
    assert g2["headers"]["weird"] == "va[l]ue"


def test_moves_joined(spark):
    g1 = next(g for g in _games(spark) if g["headers"]["site"].endswith("g1"))
    assert g1["moves"] == "1. e4 e5 1-0"


def test_multiline_moves_joined_in_order(spark):
    text = (
        '[Event "X"]\n[Site "https://lichess.org/g9"]\n'
        "not-a-header continuation\n1. e4 e5 2. Nf3 1-0\n"
    )
    games = _games(spark, text)
    assert games[0]["moves"] == "not-a-header continuation 1. e4 e5 2. Nf3 1-0"


def test_duplicate_header_last_wins(spark):
    text = (
        '[Event "first"]\n[Event "second"]\n'
        '[Site "https://lichess.org/g3"]\n1. e4 1-0\n'
    )
    games = _games(spark, text)
    assert games[0]["headers"]["event"] == "second"


def test_read_pgn_lines_roundtrip(tmp_path, spark):
    p = tmp_path / "dump.pgn"
    p.write_text(FIX)
    lines = pgn.read_pgn_lines(spark, str(p))
    games = pgn.assemble_games(pgn.sessionize(lines))
    assert games.count() == 2
    assert lines.agg(F.max("line_no")).collect()[0][0] == len(FIX.splitlines())


def test_read_pgn_lines_split_proof(tmp_path, spark):
    """A PGN file larger than one input split must parse identically:
    line numbers come from file bytes (wholetext + posexplode), so even a
    pathologically small maxPartitionBytes cannot scramble header order."""
    from knightshift_spark.queries.pgn_e2e import PGN_FIXTURE, run_pgn_pipeline

    p = tmp_path / "big.pgn"
    p.write_text(PGN_FIXTURE)
    expected = sorted(map(tuple, run_pgn_pipeline(spark).collect()))

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        from knightshift_spark.pipelines.clean import clean_games
        from knightshift_spark.pipelines.ingest import ingest_games
        from knightshift_spark.queries.pgn_e2e import _OUT_COLS

        lines = pgn.read_pgn_lines(spark, str(p))
        games = pgn.assemble_games(pgn.sessionize(lines))
        got = sorted(
            map(tuple, clean_games(ingest_games(games)).valid.select(*_OUT_COLS).collect())
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert got == expected


def test_crlf_line_endings(tmp_path, spark):
    p = tmp_path / "crlf.pgn"
    p.write_text(FIX.replace("\n", "\r\n"))
    lines = pgn.read_pgn_lines(spark, str(p))
    games = pgn.assemble_games(pgn.sessionize(lines))
    assert games.count() == 2
