"""Schema contracts: diff precision, hard gate, conform/reject split
semantics with per-row reasons."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from knightshift_spark.contracts import assert_schema, conform, schema_diff


def test_schema_diff_and_assert(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, x double")
    ok = "id long, name string, x double"
    assert schema_diff(df, ok) == {"missing": [], "extra": [], "retyped": []}
    assert assert_schema(df, ok) is df
    bad = "id int, name string, y double"
    d = schema_diff(df, bad)
    assert d["missing"] == ["y"]
    assert d["extra"] == ["x"]
    assert d["retyped"] == [("id", "bigint", "int")]
    with pytest.raises(ValueError, match="retyped"):
        assert_schema(df, bad)
    # allow_extra tolerates surplus columns but not drift
    assert_schema(df, "id long, name string", allow_extra=True)
    with pytest.raises(ValueError, match="missing"):
        assert_schema(df, "id long, missing_col string", allow_extra=True)


def test_conform_split_and_reasons(spark):
    rows = [
        ("1", "alice"),   # clean
        ("x", "bob"),     # uncastable id
        ("3", None),      # null in required name
        (None, "carol"),  # null id is fine (id nullable here)
    ]
    df = spark.createDataFrame(rows, "id string, name string")
    want = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("name", T.StringType(), False),
        ]
    )
    good, bad = conform(df, want)
    assert [(r["id"], r["name"]) for r in good.orderBy("name").collect()] == [
        (1, "alice"),
        (None, "carol"),
    ]
    assert good.schema == want or [f.name for f in good.schema.fields] == ["id", "name"]
    reasons = {r["name"]: r["__reject_reason"] for r in bad.collect()}
    assert reasons == {"bob": "uncastable:id", None: "null-required:name"}
    # rejects keep the ORIGINAL (uncast) values for debugging
    assert {r["id"] for r in bad.collect()} == {"x", "3"}


def test_conform_missing_required_column_rejects_rows(spark):
    df = spark.createDataFrame([("a",)], "name string")
    good, bad = conform(df, T.StructType([
        T.StructField("name", T.StringType(), True),
        T.StructField("id", T.LongType(), False),
    ]))
    assert good.collect() == []
    assert bad.collect()[0]["__reject_reason"] == "null-required:id"
