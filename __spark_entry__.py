"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every declared query from SURVEY.md §2.8 plus the
scale-extension operators (dedup / similarity / text analysis / events);
``oracle_sql()`` returns the DuckDB-equivalent SQL for each
SQL-expressible entry. Implementations live in
``knightshift_spark/queries/`` — this module is only the contract shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from knightshift_spark.queries import load_all
from knightshift_spark.session import tune_session

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: TPC-H Q1-shaped pricing summary (q15)."""
    specs = load_all()
    return specs["q15_pricing_summary"].spark_fn(tune_session(spark), _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query (SURVEY.md §2)."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(tune_session(spark), sf_dir)

        return run

    return {name: _wrap(spec.spark_fn) for name, spec in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query. Entries
    without an oracle are omitted — for those the driver records only the
    Spark row count (no comparison), which is why every no-oracle query's
    OUTPUT carries its own self-verifying ``ok`` boolean (recall bounds /
    funnel monotonicity) computed inside the query."""
    return {
        name: spec.oracle
        for name, spec in sorted(load_all().items())
        if spec.oracle is not None
    }
