"""Bucketed-table test: co-bucketed join plans with zero exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from knightshift_spark.plans.partitioning import explain_str, write_bucketed


def test_cobucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    a = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bktest.fact_a", ["k"], num_buckets=4, sort_by=["k"])
    write_bucketed(b, "bktest.fact_b", ["k"], num_buckets=4, sort_by=["k"])

    ta, tb = spark.table("bktest.fact_a"), spark.table("bktest.fact_b")
    # disable broadcast so the join strategy decision is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "k")
        plan = explain_str(joined)
        assert "Exchange" not in plan, "co-bucketed join should not shuffle"
        assert joined.count() == 5000
        # per-key agg on the bucket key also skips its shuffle
        agg_plan = explain_str(ta.groupBy("k").agg(F.sum("va")))
        assert "Exchange" not in agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bktest.fact_a")
        spark.sql("DROP TABLE IF EXISTS bktest.fact_b")
