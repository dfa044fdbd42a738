"""Multimodal plumbing, REST fetcher, partitioning/skew, and plan checks."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from knightshift_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    media_repartition,
)
from knightshift_spark.plans.partitioning import explain_str, salted_join, write_partitioned
from knightshift_spark.sources.rest import fetch_bodies, profile_bodies_source


def _media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG-fake-1", (64, 64, None, 11)),
        (2, "image", "image/png", b"\x89PNG-fake-2", (32, 32, None, 11)),
        (3, "video", "video/mp4", b"mp4-fake", (640, 480, 3500, 8)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(spark):
    out1 = {r["media_id"]: r["feature"] for r in extract_features(_media(spark)).collect()}
    out2 = {r["media_id"]: r["feature"] for r in extract_features(_media(spark)).collect()}
    assert out1 == out2
    assert len(out1[1]) == 8 and out1[1] != out1[2]
    assert all(0.0 <= v <= 1.0 for v in out1[1])


def test_frame_sample_plan(spark):
    frames = frame_sample_plan(_media(spark), every_ms=1000).collect()
    # video of 3500ms sampled at 1s → ts 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_media_repartition_by_bytes(spark):
    df = media_repartition(_media(spark), target_bytes=16)
    assert df.rdd.getNumPartitions() >= 2  # 30 payload bytes / 16 → ≥2


def test_rest_fetch_offline(spark):
    keys = spark.createDataFrame([("u1",), ("u2",), ("boom",)], "id_user string")

    def fake_fetch(k: str):
        if k == "boom":
            raise RuntimeError("http 500")
        if k == "u2":
            return None  # 404
        return json.dumps({"id": k})

    out = {
        r["key"]: r["body"]
        for r in fetch_bodies(keys, fake_fetch, retry_backoff_s=0.0).collect()
    }
    assert out["u1"] == '{"id": "u1"}'
    assert out["u2"] is None and out["boom"] is None
    # adapter drops misses
    kept = profile_bodies_source(keys, fake_fetch, retry_backoff_s=0.0).collect()
    assert [r["id_user"] for r in kept] == ["u1"]


def test_write_partitioned_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [("2025-05-01", 1), ("2025-05-01", 2), ("2025-05-02", 3)], "d string, v int"
    )
    path = str(tmp_path / "pt")
    write_partitioned(df, path, ["d"])
    back = spark.read.parquet(path).filter(F.col("d") == "2025-05-01")
    assert back.count() == 2
    plan = explain_str(back)
    assert "PartitionFilters" in plan  # pruning reached the scan


def test_salted_join_correctness(spark):
    # hot key "h" dominates; salted join must return identical results
    big = spark.createDataFrame(
        [("h", i) for i in range(500)] + [("c", 1), ("d", 2)], "k string, v int"
    )
    small = spark.createDataFrame(
        [("h", "hot"), ("c", "cold"), ("x", "unmatched")], "k string, name string"
    )
    plain = big.join(small, "k").groupBy("k").count()
    salted = salted_join(big, small, "k").groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_deterministic_across_partitionings(spark):
    # the salt moves rows between reducers but NEVER changes join output:
    # any physical partitioning of the big side yields the identical
    # joined row multiset
    big = spark.createDataFrame(
        [("h", i) for i in range(300)] + [("c", 1)], "k string, v int"
    )
    small = spark.createDataFrame([("h", "hot"), ("c", "cold")], "k string, name string")

    def run(b):
        rows = salted_join(b, small, "k").collect()
        return sorted((r["k"], r["v"], r["name"]) for r in rows)

    base = run(big)
    assert base == run(big.repartition(17))
    assert base == run(big.repartition(1))


def test_salted_join_spreads_exact_duplicate_rows(spark):
    # ADVICE r5 #3: the duplicate-heavy corpus hot key is 300 IDENTICAL
    # rows — a values-only hash would put them all on one salt; the
    # position-mixed salt must spread them across >1 reducer
    from pyspark.sql import functions as FF

    big = spark.createDataFrame(
        [("h", "same") for _ in range(300)] + [("c", "x")], "k string, v string"
    )
    hashable = [FF.col("k"), FF.col("v")]
    salt_col = FF.pmod(
        FF.xxhash64(FF.monotonically_increasing_id(), *hashable), FF.lit(8)
    ).cast("int")
    n_salts = (
        big.filter(FF.col("k") == "h").select(salt_col.alias("s")).distinct().count()
    )
    assert n_salts > 1
    # and output content is still exact
    small = spark.createDataFrame([("h", "hot"), ("c", "cold")], "k string, name string")
    out = salted_join(big, small, "k").groupBy("k").count().collect()
    assert {r["k"]: r["count"] for r in out} == {"h": 300, "c": 1}


def test_salted_join_map_columns_and_rand_mode(spark):
    # map-typed columns can't be hashed — the deterministic salt must
    # skip them rather than fail analysis; rand mode still exists for
    # inputs whose hot keys are fully identical duplicate rows
    big = spark.createDataFrame(
        [("h", {"a": 1}), ("h", {"b": 2}), ("c", {"c": 3})],
        "k string, m map<string,int>",
    )
    small = spark.createDataFrame([("h", "hot"), ("c", "cold")], "k string, name string")
    out = salted_join(big, small, "k").collect()
    assert sorted(r["name"] for r in out) == ["cold", "hot", "hot"]
    out_rand = salted_join(big, small, "k", deterministic=False).collect()
    assert sorted(r["name"] for r in out_rand) == ["cold", "hot", "hot"]


def test_broadcast_in_plan(spark):
    from tests.conftest import SF_SMOKE
    from knightshift_spark.queries import load_all

    plan = explain_str(load_all()["q17_three_way_join"].spark_fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_in_plan(spark):
    from tests.conftest import SF_SMOKE
    from knightshift_spark.queries import load_all

    plan = explain_str(load_all()["q01_filter_scan"].spark_fn(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan and "l_returnflag" in plan
    # projection pruned to the 4 referenced columns at the scan
    assert "ReadSchema" in plan


def test_approx_distinct_error_bound(spark):
    from tests.conftest import SF_SMOKE
    from knightshift_spark.queries import load_all
    from knightshift_spark.tables import load_table
    from pyspark.sql import functions as F

    rows = {
        r["l_returnflag"]: r
        for r in load_all()["q54_approx_distinct"].spark_fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    for k, ex in exact.items():
        # q54's audit form carries the HLL-vs-exact bound as its own
        # output bit; the exact side must agree with a direct computation
        assert rows[k]["n_parts"] == ex
        assert rows[k]["approx_ok"], (k, rows[k])


def test_profile_table_single_pass(spark):
    from knightshift_spark.operators.profiling import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 5.0), (2, "b", 7.5)], "k int, s string, v double"
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["k"]["n_distinct"] == 2 and prof["k"]["n_nulls"] == 0
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["min_val"] == "a"
    assert prof["v"]["max_val"] == "7.5"
    # union-of-branches plan: one column-pruned scan per profiled column,
    # NO Expand (the single-agg form would multiply the row stream by
    # #distinct-groups + 1 before aggregating — the 100 TB anti-pattern)
    from knightshift_spark.plans.partitioning import explain_str
    tree = explain_str(profile_table(df)).split("\n\n")[0]
    assert "Expand" not in tree
    assert tree.count("Scan ExistingRDD") == 3  # one pruned pass per column
    # approx mode still avoids the exact-distinct shuffle entirely
    approx_tree = explain_str(profile_table(df, approx=True)).split("\n\n")[0]
    assert "Expand" not in approx_tree


def test_rest_fetch_time_budget(spark):
    """Budget exhausted -> unfetched keys omitted (retried next run),
    like the reference's SCRIPT_TIME_LIMIT unfinished-batch behavior."""
    keys = spark.createDataFrame([(f"u{i}",) for i in range(20)], "id_user string")
    got = fetch_bodies(
        keys, lambda k: "{}", seconds_per_key=0.05,
        num_partitions=1, time_budget_s=0.3,
    ).count()
    assert 0 < got < 20
    # zero budget -> nothing fetched, job still succeeds
    assert fetch_bodies(keys, lambda k: "{}", num_partitions=1, time_budget_s=0.0).count() == 0


def test_rollup_matches_cube_subset(spark):
    """ROLLUP (former q43's op) = CUBE minus the column-only grouping set:
    `.rollup()` stays covered after q43 folded into q61_cube."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE
    from knightshift_spark.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    roll = li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    cube = li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))
    # rollup's grouping sets: (a,b), (a), () — cube adds (b)
    cube_minus_b_only = cube.filter(
        ~(F.col("l_returnflag").isNull() & F.col("l_linestatus").isNotNull())
    )
    assert roll.subtract(cube_minus_b_only).count() == 0
    assert cube_minus_b_only.subtract(roll).count() == 0


def test_media_repartition_estimates_null_nbytes_without_blob_scan(spark):
    """Rows missing meta.n_bytes are estimated from the sized rows'
    average — sizing must never force length(payload) over every blob."""
    rows = [
        (1, "image", "image/png", b"x" * 16, (1, 1, None, 16)),
        (2, "image", "image/png", b"y" * 16, (1, 1, None, None)),  # unsized
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    # est total = 16 + 16 (avg of sized) = 32 -> 32//16 + 1 = 3 partitions
    out = media_repartition(df, target_bytes=16)
    assert out.rdd.getNumPartitions() == 3
    # sampled fallback measures the unsized rows directly
    out2 = media_repartition(df, target_bytes=16, sample_fraction=1.0)
    assert out2.rdd.getNumPartitions() == 3
