"""Table profiling: per-column quality stats in ONE pass.

The data-quality sibling of the cleaning stage: null rates, distinct
counts, min/max — the numbers a 100 TB ingest job logs per batch to
catch upstream drift (a spike in null elos, a new termination token).

One ``agg`` computes every column's stats simultaneously — a single
scan and one job regardless of column count; never one job per column.
Exact multi-column distinct counting makes Catalyst plan an Expand
(~n_distinct-aggs shuffle phases over tiny aggregate rows); pass
``approx=True`` (HLL) for a true single-shuffle profile on
very-high-cardinality columns at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: Sequence[str] | None = None, approx: bool = False
) -> DataFrame:
    """Long-form profile: (column, n_rows, n_nulls, n_distinct, min, max).

    min/max render as strings so one result schema fits every column type.
    """
    cols = list(columns) if columns else [f.name for f in df.schema.fields]
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.count_distinct(c))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_rows, n_nulls, n_distinct, min_val, max_val)"
        )
    )
