"""Layout ops: skew report numbers + advice branches vs hand-built
distributions; compaction file counts and content preservation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from knightshift_spark.plans.layout import (
    compact_parquet,
    key_skew_report,
    top_keys,
)


def test_skew_report_flags_hot_key(spark):
    rows = [("hot",)] * 900 + [(f"k{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string")
    rep = key_skew_report(df, ["k"], broadcast_threshold_rows=10).collect()[0]
    assert rep["n_rows"] == 1000
    assert rep["n_keys"] == 101
    assert rep["max_key_rows"] == 900
    assert rep["skew_ratio"] >= 8
    assert rep["advice"] == "salt-or-aqe"
    hot = top_keys(df, ["k"], k=1).collect()[0]
    assert (hot["k"], hot["n"]) == ("hot", 900)


def test_skew_report_advice_branches(spark):
    small = spark.createDataFrame([("a",), ("b",)], "k string")
    assert (
        key_skew_report(small, ["k"]).collect()[0]["advice"] == "broadcast"
    )
    uniform = spark.createDataFrame(
        [(f"k{i % 50}",) for i in range(5000)], "k string"
    )
    rep = key_skew_report(uniform, ["k"], broadcast_threshold_rows=10).collect()[0]
    assert rep["advice"] == "hash-partition"
    assert rep["skew_ratio"] == 1.0


def test_compact_parquet_reduces_files_and_keeps_rows(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    ).repartition(64).write.parquet(src)
    summary = compact_parquet(spark, src, dst, target_file_mb=1024)
    assert summary["files_before"] == 64
    assert summary["files_after"] == 1  # tiny data → one target file
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_compact_with_range_clustering(spark, tmp_path):
    src, dst = str(tmp_path / "frag2"), str(tmp_path / "clustered")
    # pad rows so the measured input spans several 1 MB target files
    spark.range(0, 20000).select(
        F.col("id"),
        F.concat(
            *[
                F.sha2(F.concat_ws("-", F.col("id"), F.lit(j)), 256)
                for j in range(8)
            ]
        ).alias("pad"),
    ).repartition(32).write.parquet(src)
    summary = compact_parquet(
        spark, src, dst, target_file_mb=1, order_by=["id"]
    )
    assert summary["files_after"] >= 2, summary
    files = sorted(
        os.path.join(dst, f) for f in os.listdir(dst) if f.endswith(".parquet")
    )
    ranges = []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
            .collect()[0]
        )
        ranges.append((r["lo"], r["hi"]))
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint key ranges → min/max pruning works
    assert spark.read.parquet(dst).count() == 20000
