"""Orchestrator test: two pipeline runs over a growing PGN spool —
ingest merges, cleaning deletes, enrichment inserts and flags."""

from __future__ import annotations

import json

from knightshift_spark.pipelines.run_all import run_pipeline
from knightshift_spark.queries.pgn_e2e import PGN_FIXTURE

RUN2_PGN = """\
[Event "Second Run Update"]
[Site "https://lichess.org/abc123XY"]
[White "user1"]
[Black "user2"]
[Result "1-0"]
[ECO "C33"]
[Termination "Normal"]
1. e4 e5 2. f4 1-0
[Event "Brand New"]
[Site "https://lichess.org/new999ZZ"]
[White "user10"]
[Black "user11"]
[Result "0-1"]
[Termination "Normal"]
1. Nf3 d5 0-1
"""


def _fetch(k: str):
    known = {"user1", "user2", "user5"}
    if k in known:
        return json.dumps({"id": k, "username": k.title(), "perfs": {"blitz": {"rating": 2000}}})
    return None


def test_two_run_pipeline(spark, tmp_path):
    src1 = tmp_path / "dump1"
    src1.mkdir()
    (src1 / "games.pgn").write_text(PGN_FIXTURE)
    wh = str(tmp_path / "warehouse")

    r1 = run_pipeline(spark, str(src1), wh, fetch_profile=_fetch)
    assert r1.ingested == 5  # abc(x2 deduped to 1 at merge... distinct ids)
    assert r1.valid == 3 and r1.deleted == 2
    assert r1.users_added == 3  # user1, user2, user5 resolve; others miss

    games = {r["id_game"]: r for r in spark.read.parquet(f"{wh}/games").collect()}
    assert games["abc123XY"]["ind_profile_updated"] is True  # user1 fetched
    assert games["def456ZW"]["ind_profile_updated"] is False  # user3/4 missed

    # --- run 2: an update for abc123XY + one new game ---
    src2 = tmp_path / "dump2"
    src2.mkdir()
    (src2 / "more.pgn").write_text(RUN2_PGN)
    r2 = run_pipeline(spark, str(src2), wh, fetch_profile=_fetch)
    assert r2.ingested == 2
    assert r2.valid == 4  # 3 prior + new999ZZ; abc merged not duplicated

    games = {r["id_game"]: r for r in spark.read.parquet(f"{wh}/games").collect()}
    assert games["abc123XY"]["val_opening_eco_code"] == "C33"  # update won
    assert games["abc123XY"]["val_result"] == "1-0"
    assert "new999ZZ" in games
    users = {r["id_user"] for r in spark.read.parquet(f"{wh}/users").collect()}
    assert users == {"user1", "user2", "user5"}  # insert-if-absent: no dups


def test_transactional_pipeline_matches_swap_pipeline(spark, tmp_path):
    """transactional=True produces the SAME games end state and report as
    the stage-and-swap path across two runs — plus a commit history
    (ingest merge, validation delete, enrichment flag merge per run) and
    time travel back to the pre-clean state."""
    from knightshift_spark.sources.txntable import TxnTable

    src1, src2 = tmp_path / "d1", tmp_path / "d2"
    src1.mkdir(), src2.mkdir()
    (src1 / "games.pgn").write_text(PGN_FIXTURE)
    (src2 / "more.pgn").write_text(RUN2_PGN)

    wh_swap, wh_txn = str(tmp_path / "wh_swap"), str(tmp_path / "wh_txn")
    reports = {}
    for wh, txn in ((wh_swap, False), (wh_txn, True)):
        reports[txn] = [
            run_pipeline(spark, str(src1), wh, fetch_profile=_fetch, transactional=txn),
            run_pipeline(spark, str(src2), wh, fetch_profile=_fetch, transactional=txn),
        ]
    assert reports[False] == reports[True]

    def rows(df):
        # tm_validated is a current_timestamp — wall-clock, not comparable
        return {tuple(r) for r in df.drop("tm_ingested", "tm_validated").collect()}

    table = TxnTable(spark, f"{wh_txn}/games_txn")
    assert rows(table.snapshot()) == rows(spark.read.parquet(f"{wh_swap}/games"))
    ops = [h["op"] for h in table.history()]
    # run 1: ingest merge, then the WHOLE cleaning batch (validation
    # delete of 2 invalid + clean-update merge) as ONE txn commit —
    # the reference's session-commit boundary — then the flag merge;
    # run 2: same shape (its txn carries only the clean-update; nothing
    # is invalid so delete_keys records no statement)
    assert ops == ["create", "merge", "txn", "merge",
                   "merge", "txn", "merge"]
    # time travel: before run 1's validation delete, the invalid rows exist
    assert table.snapshot(1).count() == 5  # all ingested rows, pre-clean


def test_pipeline_empty_source_dir(spark, tmp_path):
    src = tmp_path / "emptydump"
    src.mkdir()
    r = run_pipeline(spark, str(src), str(tmp_path / "wh0"))
    assert r.ingested == 0 and r.valid == 0 and r.deleted == 0
