"""plans.localrel: pure-JVM local relations (r14 optimization 1).

Pins the two properties the optimization rests on:
1. the physical plan is a LocalTableScan (no applySchemaToPythonRDD
   Python-RDD scan re-running Python workers per action);
2. rows and schema are byte-identical to the list-based
   ``createDataFrame`` path it replaced.
"""

from __future__ import annotations

import datetime

import pytest

from knightshift_spark.plans.localrel import local_relation
from knightshift_spark.plans.partitioning import explain_str

SCHEMA = "a int, b string, c boolean, d double, e date, f array<double>"
ROWS = [
    (1, "x'y\"z\n", True, 2.5, datetime.date(2025, 5, 2), [1.0, 2.0]),
    (None, None, None, None, None, None),
]


def test_local_relation_is_local_table_scan(spark):
    plan = explain_str(local_relation(spark, ROWS, SCHEMA))
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_local_relation_matches_list_path(spark):
    a = local_relation(spark, ROWS, SCHEMA)
    b = spark.createDataFrame(ROWS, SCHEMA)
    assert a.schema == b.schema
    assert sorted(map(repr, a.collect())) == sorted(map(repr, b.collect()))


def test_local_relation_empty(spark):
    df = local_relation(spark, [], SCHEMA)
    assert df.count() == 0
    assert df.schema == spark.createDataFrame([], SCHEMA).schema
    plan = explain_str(df)
    assert "ExistingRDD" not in plan


def test_fixture_queries_have_no_python_rdd_scan(spark):
    """The r13 hot spots (q28/q42/q63) must stay Python-free at exec."""
    from knightshift_spark.queries import load_all

    specs = load_all()
    for name in ("q28_pgn_pipeline", "q42_profile_flatten", "q63_opening_backfill"):
        plan = explain_str(specs[name].spark_fn(spark, "/root/testdata/sf0.001"))
        assert "applySchemaToPythonRDD" not in plan, name
