"""Schema contracts: declared-shape enforcement at pipeline boundaries.

The reference hand-validates every row against the table's expected
shape before writing (`validate_tv_channel_games.py` — required fields,
castable ints, known enums). The engine-level generalization is a
CONTRACT: a declared StructType (or DDL string) that incoming data must
conform to, with the three outcomes a production boundary needs:

- ``assert_schema``: hard gate — raise with a precise diff (missing /
  extra / retyped columns) instead of letting a drifted upstream write
  garbage downstream;
- ``conform``: soft gate — project to the contract's columns, cast with
  ``try_cast`` semantics, and SPLIT into (conformed, rejects): a row
  rejects when a non-null value fails its cast or a non-nullable field
  lands null. The reference's valid/deleted split
  (`pipelines/clean.py`) is exactly this shape, specialized;
- rejects carry a ``__reject_reason`` column naming the first offending
  field, so quarantine tables are debuggable.

Everything is column expressions — the cast matrix compiles into one
projection, the split is two filters over it (one scan under lazy
evaluation; checkpoint between if both sides fan out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_struct(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return T.StructType.fromDDL(schema)


def schema_diff(df: DataFrame, schema: T.StructType | str) -> dict:
    """{missing, extra, retyped} — the contract violation report.
    ``retyped`` lists (name, have, want) for shared columns whose types
    differ."""
    want = _as_struct(schema)
    have = {f.name: f.dataType for f in df.schema.fields}
    target = {f.name: f.dataType for f in want.fields}
    return {
        "missing": sorted(set(target) - set(have)),
        "extra": sorted(set(have) - set(target)),
        "retyped": sorted(
            (n, have[n].simpleString(), target[n].simpleString())
            for n in set(have) & set(target)
            if have[n] != target[n]
        ),
    }


def assert_schema(
    df: DataFrame, schema: T.StructType | str, allow_extra: bool = False
) -> DataFrame:
    """Raise ``ValueError`` with the full diff unless ``df`` already has
    the contract's columns and types (order-insensitive). Returns the
    input for chaining."""
    diff = schema_diff(df, schema)
    if allow_extra:
        diff["extra"] = []
    if any(diff.values()):
        raise ValueError(f"schema contract violated: {diff}")
    return df


def conform(
    df: DataFrame,
    schema: T.StructType | str,
    reject_reason_col: str = "__reject_reason",
) -> tuple[DataFrame, DataFrame]:
    """(conformed, rejects): project to the contract's columns in its
    order, casting each with try-cast semantics. A row rejects when a
    present non-null value fails its cast, or a non-nullable field ends
    up null (absent columns read as null — missing NON-nullable columns
    therefore reject every row rather than raising, keeping the gate
    row-local). ``rejects`` keeps the ORIGINAL columns plus the reason;
    ``conformed`` has exactly the contract's shape."""
    want = _as_struct(schema)
    have = {f.name for f in df.schema.fields}
    casts, reason = [], F.lit(None).cast("string")
    for f in want.fields:
        src = F.col(f.name) if f.name in have else F.lit(None)
        cast = src.try_cast(f.dataType)
        casts.append(cast.alias(f.name))
        bad_cast = (
            src.isNotNull() & cast.isNull()
            if f.name in have
            else F.lit(False)
        )
        bad_null = cast.isNull() if not f.nullable else F.lit(False)
        # first offending field wins (coalesce keeps earlier reasons)
        reason = F.coalesce(
            reason,
            F.when(bad_cast, F.lit(f"uncastable:{f.name}")),
            F.when(bad_null, F.lit(f"null-required:{f.name}")),
        )
    tagged = df.withColumn(reject_reason_col, reason)
    conformed = tagged.filter(F.col(reject_reason_col).isNull()).select(*casts)
    rejects = tagged.filter(F.col(reject_reason_col).isNotNull())
    return conformed, rejects
