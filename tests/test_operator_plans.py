"""Plan-shape lint for the round-6b operators (the declared-query lint's
sibling): no row-at-a-time Python, no cartesian products, Arrow stages
only where declared, broadcasts where promised."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "beta gamma delta epsilon")],
        "doc_id long, text string",
    )


def test_substring_strip_is_pure_jvm(spark):
    from knightshift_spark.operators.substring import strip_duplicated_spans

    p = _plan(strip_duplicated_spans(_docs(spark), k=5, density=1))
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p and "MapInPandas" not in p
    assert "CartesianProduct" not in p


def test_fuzzy_join_no_cartesian_and_jvm_only(spark):
    from knightshift_spark.operators.fuzzyjoin import fuzzy_join

    p = _plan(fuzzy_join(_docs(spark), _docs(spark), threshold=0.5))
    assert "BatchEvalPython" not in p and "MapInPandas" not in p
    assert "CartesianProduct" not in p


def test_heavy_hitters_recount_broadcasts_candidates(spark):
    from knightshift_spark.operators.heavyhitters import heavy_hitters

    items = spark.createDataFrame([("x",)] * 30 + [("y",)], "item string")
    out = heavy_hitters(items, cap=8, min_count=10, mode="two_phase")
    p = _plan(out)
    assert p.count("MapInPandas") == 0  # phase 1 already materialized
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    assert "BatchEvalPython" not in p


def test_mixture_apply_single_scan_with_broadcast_plan(spark):
    from knightshift_spark.operators.mixture import apply_mixture_plan

    docs = spark.createDataFrame(
        [(1, "a b", "s"), (2, "c d", "t")], "doc_id long, text string, source string"
    )
    out = apply_mixture_plan(
        docs, [{"source": "s", "epochs": 2.5}, {"source": "t", "epochs": 1.0}]
    )
    p = _plan(out)
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p and "MapInPandas" not in p
    # one scan of the docs relation, not one per plan source
    assert p.count("LocalTableScan") + p.count("Scan ExistingRDD") <= 3


def test_matview_read_is_scan_only(spark, tmp_path):
    from knightshift_spark.streaming.matview import merge_view_batch, read_view

    view = str(tmp_path / "v")
    merge_view_batch(
        spark.range(0, 50).select(
            (F.col("id") % 3).alias("g"), F.col("id").cast("double").alias("v")
        ),
        view, ["g"], "v", batch_id=0,
    )
    p = _plan(read_view(spark, view))
    assert "HashAggregate" not in p  # served from partials, not recomputed
    assert "Exchange" not in p
