"""Pure-JVM local relations for small in-memory fixtures and results.

``spark.createDataFrame(list_of_tuples, schema)`` routes the rows through
``SparkContext.parallelize`` + ``applySchemaToPythonRDD``: the relation
becomes a *Python RDD* with ``defaultParallelism`` partitions, and EVERY
execution of any plan containing it re-runs that many Python-worker
tasks. Measured on this build (r14, guide §4 "the Python boundary"):
a 5-row fixture costs ~2.5 CPU-s per execution at ``local[8]`` and the
two-fixture q63 plan ~20 CPU-s per execution at ``local[32]`` — pure
Python-worker scheduling for a handful of rows, re-paid on every action.

The pandas→Arrow construction path instead lands in the JVM as a
``LocalTableScan``: zero Python at execution time, no scan job, and the
optimizer can constant-fold through it. Same rows, same schema, same
results — only the physical source node changes (verified by the parity
suite and ``tests/test_localrel.py``).

Use :func:`local_relation` for any bounded driver-side row set that
becomes part of an executed plan (fixtures, collected results re-wrapped
as DataFrames, broadcast weight maps). It intentionally does NOT handle
unbounded data — callers own keeping inputs driver-sized.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_relation(
    spark: SparkSession,
    rows: Iterable[Sequence],
    schema: str | StructType,
) -> DataFrame:
    """Build a DataFrame whose physical plan is a JVM ``LocalTableScan``.

    ``rows``: iterable of tuples/Rows (driver-sized, bounded by the
    caller). ``schema``: DDL string or ``StructType`` — always explicit,
    so the result's schema is byte-identical to the list-based
    ``createDataFrame`` it replaces.

    The pandas frame is built with ``dtype=object`` so ``None`` survives
    as a true null in every column (a numeric pandas dtype would coerce
    it to NaN and, for ints, the whole column to float). The Arrow
    converter then casts each column to the schema's field type exactly
    as the pickle path would.
    """
    import pandas as pd

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    names = [f.name for f in schema.fields]
    data = [tuple(r) for r in rows]
    if not data:
        # an empty pandas frame falls back to the RDD path; a one-row
        # all-null frame + limit(0) stays a LocalTableScan, and the
        # optimizer's empty-relation propagation folds it away entirely
        pdf = pd.DataFrame([(None,) * len(names)], columns=names, dtype=object)
        return spark.createDataFrame(pdf, schema).limit(0)
    pdf = pd.DataFrame(data, columns=names, dtype=object)
    return spark.createDataFrame(pdf, schema)
