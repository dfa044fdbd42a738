"""Range-join operator vs a DuckDB BETWEEN-join oracle, plus the
no-cartesian plan guarantee."""

from __future__ import annotations

import duckdb

from knightshift_spark.operators.interval import range_join

POINTS = [(i, (i * 37) % 500) for i in range(80)]               # (pid, v)
INTERVALS = [
    (j, (j * 53) % 450, (j * 53) % 450 + (j * 7) % 120) for j in range(40)
]  # (iid, s, e) — spans 0..119 wide, some spanning many bins


def _dfs(spark):
    p = spark.createDataFrame(POINTS, "pid long, v long")
    i = spark.createDataFrame(INTERVALS, "iid long, s long, e long")
    return p, i


def _oracle(how: str):
    con = duckdb.connect()
    pv = ", ".join(f"({a}, {b})" for a, b in POINTS)
    iv = ", ".join(f"({a}, {b}, {c})" for a, b, c in INTERVALS)
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return set(
        map(
            tuple,
            con.execute(
                f"""
        SELECT pid, v, iid, s, e
        FROM (VALUES {pv}) AS p(pid, v)
        {join} (VALUES {iv}) AS i(iid, s, e)
          ON p.v BETWEEN i.s AND i.e
        """
            ).fetchall(),
        )
    )


def test_range_join_matches_between_oracle(spark):
    p, i = _dfs(spark)
    for bin_width in (16, 64, 1000):  # incl. one bin covering everything
        got = {
            (r["pid"], r["v"], r["iid"], r["s"], r["e"])
            for r in range_join(p, i, "v", "s", "e", bin_width).collect()
        }
        assert got == _oracle("inner"), f"bin_width={bin_width}"


def test_range_join_left_keeps_unmatched_points(spark):
    p, i = _dfs(spark)
    got = {
        (r["pid"], r["v"], r["iid"], r["s"], r["e"])
        for r in range_join(p, i, "v", "s", "e", 32, how="left").collect()
    }
    assert got == _oracle("left")


def test_range_join_left_null_payload_not_duplicated(spark):
    """A matched point carrying a NULL in a non-join column must appear
    exactly once (null-safe anti-join): plain equality would fail to
    anti-match it and emit a second, null-extended copy."""
    p = spark.createDataFrame(
        [(1, 10, None), (2, 10, "x"), (3, 999, None)],
        "pid long, v long, tag string",
    )
    i = spark.createDataFrame([(1, 0, 50)], "iid long, s long, e long")
    rows = range_join(p, i, "v", "s", "e", 16, how="left").collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r)
    assert len(by_pid[1]) == 1 and by_pid[1][0]["iid"] == 1  # matched, once
    assert len(by_pid[2]) == 1 and by_pid[2][0]["iid"] == 1
    assert len(by_pid[3]) == 1 and by_pid[3][0]["iid"] is None  # unmatched


def test_range_join_rejects_bad_bin_width(spark):
    import pytest

    p, i = _dfs(spark)
    for bw in (0, -5):
        with pytest.raises(ValueError, match="bin_width"):
            range_join(p, i, "v", "s", "e", bw)


def test_range_join_plan_is_equi_not_nested_loop(spark):
    from knightshift_spark.plans.partitioning import explain_str

    p, i = _dfs(spark)
    plan = explain_str(range_join(p, i, "v", "s", "e", 32))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # the bin equi-join (hash or sort-merge)
