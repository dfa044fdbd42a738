"""Differential test: the engine's cleaning stage vs an independent
pure-Python implementation of the reference's rules, over a seeded
10k-row dirty fixture (FIXTURES.md §2 mix). If the two disagree on ANY
row, the engine (or the reading of the reference) is wrong."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from knightshift_spark.pipelines.clean import clean_games

N_ROWS = 10_000
SEED = 42

_RESULTS_OK = ["1-0", "0-1", "1/2-1/2"]
_RESULTS_BAD = ["*", "", "2-0", None]
_TITLES = ["GM", "IM", " fm ", "none", "Unranked", "", None, "wgm"]
_TERMS = ["Normal", "Time forfeit", "UNTERMINATED", "weird", "resigned", "ABANDONED", None]
_ECOS = ["C20", "?", "B01", " ? ", "", None, "A0?"]
_ELOS = ["1500", "", "abc", None, "2100", " 1800 "]


def _gen_rows(n: int) -> list[dict]:
    rng = random.Random(SEED)
    rows = []
    for i in range(n):
        roll = rng.random()
        row = {
            "id_game": f"g{i:06d}",
            "id_user_white": f"w{i}" if roll > 0.03 else rng.choice(["", None]),
            "id_user_black": f"b{i}" if roll > 0.06 or roll <= 0.03 else rng.choice(["", None]),
            "val_result": rng.choice(_RESULTS_OK) if roll > 0.11 or roll <= 0.06 else rng.choice(_RESULTS_BAD),
            "val_moves_pgn": "1. e4 e5" if roll > 0.14 or roll <= 0.11 else rng.choice(["", None]),
            "val_elo_white": rng.choice(_ELOS),
            "val_elo_black": rng.choice(_ELOS),
            "val_title_white": rng.choice(_TITLES),
            "val_title_black": rng.choice(_TITLES),
            "val_opening_eco_code": rng.choice(_ECOS),
            "val_termination": rng.choice(_TERMS),
            "ind_validated": rng.random() < 0.2,
        }
        rows.append(row)
    return rows


# ---- independent Python implementation of the reference's rules ----
# (validate_tv_channel_games.py semantics, written without looking at the
# engine code so bugs don't correlate)

_CANON_TERMS = {"NORMAL", "TIME_FORFEIT", "RESIGNED", "ABANDONED"}


def _py_needs_fix(r: dict) -> bool:
    eco = r["val_opening_eco_code"] or ""
    term = r["val_termination"] or ""
    return (not r["ind_validated"]) or ("?" in eco) or (term not in _CANON_TERMS)


def _py_missing(v) -> bool:
    return v is None or str(v).strip() == ""


def _py_delete(r: dict) -> bool:
    if not _py_needs_fix(r):
        return False
    for f in ("id_user_white", "id_user_black", "val_moves_pgn", "val_result"):
        if _py_missing(r[f]):
            return True
    return r["val_result"] not in _RESULTS_OK


def _py_int(v):
    if v is None:
        return None
    try:
        return int(str(v).strip())
    except ValueError:
        return None


def _py_title(v):
    if v is None or str(v).strip() == "" or str(v).strip().lower() in ("none", "unranked"):
        return "None"
    return str(v).strip().upper()


def _py_term(v):
    t = (v or "").strip().upper()
    if t == "TIME FORFEIT":
        return "TIME_FORFEIT"
    if t == "UNTERMINATED":
        return "NORMAL"
    return t if t in _CANON_TERMS else "NORMAL"


def _py_eco(v):
    if v is None:
        return None
    t = str(v).strip()
    return None if t == "?" else t


def _py_clean(r: dict) -> dict:
    if not _py_needs_fix(r):
        return {
            **r,
            "val_elo_white": _py_int(r["val_elo_white"]),
            "val_elo_black": _py_int(r["val_elo_black"]),
            "notes": None,
        }
    notes = []
    if r["val_elo_white"] is not None and _py_int(r["val_elo_white"]) is None:
        notes.append("white elo invalid")
    if r["val_elo_black"] is not None and _py_int(r["val_elo_black"]) is None:
        notes.append("black elo invalid")
    if (r["val_opening_eco_code"] or "").strip() == "?":
        notes.append("eco unknown")
    return {
        "id_game": r["id_game"],
        "val_elo_white": _py_int(r["val_elo_white"]),
        "val_elo_black": _py_int(r["val_elo_black"]),
        "val_title_white": _py_title(r["val_title_white"]),
        "val_title_black": _py_title(r["val_title_black"]),
        "val_opening_eco_code": _py_eco(r["val_opening_eco_code"]),
        "val_termination": _py_term(r["val_termination"]),
        "notes": ", ".join(notes) if notes else "Valid",
    }


def test_cleaning_differential(spark):
    rows = _gen_rows(N_ROWS)
    df = spark.createDataFrame(
        [
            (
                r["id_game"], "ev", "url", None, r["id_user_white"], r["id_user_black"],
                r["val_result"], None, None, r["val_elo_white"], r["val_elo_black"],
                r["val_title_white"], r["val_title_black"], "Standard", "180+0",
                r["val_opening_eco_code"], None, r["val_termination"], r["val_moves_pgn"],
                None, None, r["ind_validated"], None, False,
            )
            for r in rows
        ],
        "id_game string, val_event_name string, val_site_url string, dt_game date, "
        "id_user_white string, id_user_black string, val_result string, dt_game_utc date, "
        "tm_game_utc string, val_elo_white string, val_elo_black string, "
        "val_title_white string, val_title_black string, val_variant string, "
        "val_time_control string, val_opening_eco_code string, val_opening_name string, "
        "val_termination string, val_moves_pgn string, tm_ingested timestamp, "
        "tm_validated timestamp, ind_validated boolean, val_validation_notes string, "
        "ind_profile_updated boolean",
    )
    res = clean_games(df)
    got_valid = {r["id_game"]: r for r in res.valid.collect()}
    got_deleted = {r["id_game"] for r in res.deleted.collect()}

    want_deleted = {r["id_game"] for r in rows if _py_delete(r)}
    assert got_deleted == want_deleted
    assert set(got_valid) == {r["id_game"] for r in rows} - want_deleted
    assert len(want_deleted) > 200  # the dirty mix actually exercised deletion

    mismatches = []
    for r in rows:
        if r["id_game"] in want_deleted:
            continue
        want = _py_clean(r)
        g = got_valid[r["id_game"]]
        if _py_needs_fix(r):
            checks = {
                "val_elo_white": want["val_elo_white"],
                "val_elo_black": want["val_elo_black"],
                "val_title_white": want["val_title_white"],
                "val_title_black": want["val_title_black"],
                "val_opening_eco_code": want["val_opening_eco_code"],
                "val_termination": want["val_termination"],
                "val_validation_notes": want["notes"],
            }
        else:  # untouched rows keep originals (except elo typing)
            checks = {
                "val_elo_white": want["val_elo_white"],
                "val_elo_black": want["val_elo_black"],
                "val_title_white": r["val_title_white"],
                "val_termination": r["val_termination"],
            }
        for col, w in checks.items():
            if g[col] != w:
                mismatches.append((r["id_game"], col, g[col], w))
    assert mismatches == [], mismatches[:10]
