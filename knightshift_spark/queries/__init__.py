"""Declared query registry (SURVEY.md §2.8 Q01–Q28 + scale extensions).

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string DuckDB can run on the same
parquet tables. Column names/types are aligned on both sides because the
driver's compare sorts columns by name before value-hashing.

Determinism rules used throughout (SURVEY.md §2.8 canonicalization):
- every DOUBLE aggregate that sums floats goes through an exact
  ``DECIMAL`` accumulation, then casts to double and rounds — float sum
  order varies between engines (and between Spark partitions), decimals
  don't;
- tie-breaks in any top-k / ranking are total orders.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Register a declared query. Used as a decorator over the Spark builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: fills REGISTRY)."""
    from knightshift_spark.queries import (  # noqa: F401
        corpusops,
        dedup,
        events,
        mining,
        pgn_e2e,
        profiles,
        relational,
        relational2,
        similarity,
        textops,
        txn,
    )

    return REGISTRY
