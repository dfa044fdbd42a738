"""Spark SQL string interface over the engine's tables and functions.

The reference has no query language; on Spark, ANSI SQL comes free once
views are registered — this module is the thin surface that makes the
engine usable from pure SQL (notebooks, JDBC/Thrift frontends, dbt-style
tooling). Engine column functions are exposed as SQL UDF-free macros via
``selectExpr``-compatible SQL strings where Spark has no direct builtin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from knightshift_spark.session import tune_session
from knightshift_spark.tables import register_views


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ANSI SQL string against the star schema at ``sf_dir``.

    Views register idempotently; session semantics (UTC, try-cast) are
    pinned the same way the DataFrame API path pins them, so SQL and
    DataFrame results agree bit-for-bit.
    """
    tune_session(spark)
    register_views(spark, sf_dir)
    return spark.sql(query)
