"""grouped_percentiles: exact value-histogram percentiles (VERDICT r5 #1).

The operator must be bit-identical to the full-multiset ``F.percentile``
(== DuckDB ``quantile_cont``) on ANY input — the histogram is lossless;
only the intermediate STATE is bounded. Tests drive it against both
references on random multisets (duplicates, negative values, NULLs,
float values) plus the structural edges (single row, all-NULL group,
p=0/1, extra_sums fusion).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from knightshift_spark.operators.percentiles import grouped_percentiles


def _reference(spark_df, ps):
    """F.percentile over the same grouping — the exact multiset oracle."""
    aggs = [
        F.percentile("v", F.lit(p)).alias(name) for name, p in ps.items()
    ]
    return {
        tuple(r[:1]): tuple(r[1:])
        for r in (
            spark_df.groupBy("g").agg(*aggs).select("g", *ps.keys()).collect()
        )
    }


def _ours(spark_df, ps, **kw):
    out = grouped_percentiles(spark_df, ["g"], "v", ps, **kw)
    return {
        tuple(r[:1]): tuple(r[1 + 1 :])  # skip n
        for r in out.select("g", "n", *ps.keys()).collect()
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_full_multiset_percentile(spark, seed):
    rng = random.Random(seed)
    rows = [
        (g, rng.choice([None] + list(range(1, 51))))
        for g in ("a", "b", "c")
        for _ in range(rng.randint(1, 200))
    ]
    df = spark.createDataFrame(rows, "g string, v int")
    ps = {"p10": 0.1, "p50": 0.5, "p90": 0.9, "p99": 0.99}
    ref, got = _reference(df, ps), _ours(df, ps)
    assert set(ref) == set(got)
    for k in ref:
        for a, b in zip(ref[k], got[k]):
            if a is None:
                assert b is None
            else:
                assert b == pytest.approx(a, abs=1e-9), (k, ref[k], got[k])


def test_matches_duckdb_quantile_cont_float_values(spark):
    rng = random.Random(7)
    # float domain with ties — still exact (histogram is lossless)
    domain = [round(rng.uniform(-5, 5), 2) for _ in range(20)]
    rows = [(f"g{i % 4}", rng.choice(domain)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"],): (r["p25"], r["p75"])
        for r in grouped_percentiles(
            df, ["g"], "v", {"p25": 0.25, "p75": 0.75}
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for g, p25, p75 in con.execute(
        "SELECT g, quantile_cont(v, 0.25), quantile_cont(v, 0.75) FROM t GROUP BY g"
    ).fetchall():
        assert got[(g,)][0] == pytest.approx(p25, abs=1e-9)
        assert got[(g,)][1] == pytest.approx(p75, abs=1e-9)


def test_edges_single_row_all_null_extremes(spark):
    df = spark.createDataFrame(
        [("one", 42), ("nulls", None), ("nulls", None), ("two", 1), ("two", 9)],
        "g string, v int",
    )
    out = {
        r["g"]: r
        for r in grouped_percentiles(
            df, ["g"], "v", {"p0": 0.0, "p50": 0.5, "p100": 1.0}
        ).collect()
    }
    assert (out["one"]["p0"], out["one"]["p50"], out["one"]["p100"]) == (42, 42, 42)
    assert out["nulls"]["p50"] is None and out["nulls"]["n"] == 2
    assert (out["two"]["p0"], out["two"]["p50"], out["two"]["p100"]) == (1, 5, 9)


def test_extra_sums_ride_the_histogram_shuffle(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 2, 30), ("b", 5, 7)],
        "g string, v int, x long",
    )
    out = {
        r["g"]: r
        for r in grouped_percentiles(
            df, ["g"], "v", {"p50": 0.5}, extra_sums=["x"]
        ).collect()
    }
    assert out["a"]["x"] == 60 and out["a"]["n"] == 3 and out["a"]["p50"] == 2
    assert out["b"]["x"] == 7 and out["b"]["p50"] == 5


def test_rejects_out_of_range_percentile(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v int")
    with pytest.raises(ValueError, match="must be in"):
        grouped_percentiles(df, ["g"], "v", {"bad": 1.5})


def test_plan_has_no_multiset_percentile(spark):
    """The whole point: the physical plan must contain no Percentile
    aggregate (full-multiset buffer) — only histogram counts + the
    bounded collect_list."""
    from knightshift_spark.plans.partitioning import explain_str

    df = spark.createDataFrame([("a", 1)], "g string, v int")
    plan = explain_str(grouped_percentiles(df, ["g"], "v", {"p50": 0.5}))
    assert "percentile" not in plan.lower()
