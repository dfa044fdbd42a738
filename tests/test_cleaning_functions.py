"""Unit tests for the cleaning column functions — dirty-value matrix from
FIXTURES.md §2 / the reference's edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from knightshift_spark.functions import cleaning as C


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _vals(spark, data, fn):
    df = spark.createDataFrame([(d,) for d in data], "x string")
    return [r["v"] for r in df.select(fn(F.col("x")).alias("v")).collect()]


def test_safe_int(spark):
    assert _vals(spark, ["1500", " 42 ", "", "abc", None, "1.5"], C.safe_int) == [
        1500, 42, None, None, None, None,
    ]


def test_parse_pgn_date(spark):
    out = _vals(spark, ["2025.05.01", "2025.13.99", "", None, "bad"], C.parse_pgn_date)
    assert [str(d) if d else None for d in out] == [
        "2025-05-01", None, None, None, None,
    ]


def test_parse_pgn_time(spark):
    assert _vals(spark, ["17:40:12", "25:99:00", "", None], C.parse_pgn_time) == [
        "17:40:12", None, None, None,
    ]


def test_normalize_title(spark):
    assert _vals(
        spark, ["GM", " gm ", "none", "Unranked", "", None, " im"], C.normalize_title
    ) == ["GM", "GM", "None", "None", "None", "None", "IM"]


def test_eco_nullif(spark):
    assert _vals(spark, ["C20", "?", " ? ", "", None], C.eco_nullif_unknown) == [
        "C20", None, None, "", None,
    ]


def test_canonicalize_termination(spark):
    assert _vals(
        spark,
        ["Normal", "Time forfeit", "UNTERMINATED", "weird", "resigned", "ABANDONED", None],
        C.canonicalize_termination,
    ) == ["NORMAL", "TIME_FORFEIT", "NORMAL", "NORMAL", "RESIGNED", "ABANDONED", "NORMAL"]


def test_null_sentinels(spark):
    assert _vals(
        spark, ["<null>", "NULL", "none", "", "  ok  ", None], C.null_sentinel_to_null
    ) == [None, None, None, None, "ok", None]


def test_bool_from_str(spark):
    assert _vals(
        spark, ["true", "1", "false", "0", "<null>", None, "yes"], C.bool_from_str
    ) == [True, True, False, False, None, None, False]


def test_validation_notes(spark):
    df = spark.createDataFrame([(1, True, False), (2, False, False), (3, True, True)],
                               "id int, a boolean, b boolean")
    out = {
        r["id"]: r["notes"]
        for r in df.select(
            "id",
            C.validation_notes(
                F.when(F.col("a"), F.lit("rule a")), F.when(F.col("b"), F.lit("rule b"))
            ).alias("notes"),
        ).collect()
    }
    assert out == {1: "rule a", 2: "Valid", 3: "rule a, rule b"}


def test_game_id_from_url(spark):
    assert _vals(
        spark, ["https://lichess.org/abc123XY", "xyz"], C.game_id_from_url
    ) == ["abc123XY", "xyz"]
