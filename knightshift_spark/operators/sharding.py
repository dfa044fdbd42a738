"""Training-shard writer: the OUTPUT stage of the curation pipeline.

A curated corpus is consumed as fixed-size shards — decorrelated
(globally shuffled), token-balanced, reproducible, and verifiable.
This module lays documents into shards of ``shard_tokens`` tokens each
and writes them with a manifest:

- **Deterministic shuffle**: documents are ordered by the portable
  md5-derived hash of (id, salt) — the same keyed-permutation device as
  ``operators.sampling`` — so shard membership is a pure function of
  (ids, salt): re-runs produce byte-identical shards, a different salt
  re-deals the permutation, and no engine ``rand()`` is involved.
- **Token balance without splitting documents**: the global running
  token total along the shuffled order assigns shard =
  ``prefix DIV shard_tokens`` (integer DIV — exact past 2^53). Every
  shard lands within one document of the budget; documents never split
  (the concat-and-split discipline is ``packing.chunk_pack``).
- **Scale shape**: the running total is the two-phase distributed
  prefix sum shared with ``operators.packing`` (range-bucket → local
  cumsum → broadcast bucket offsets) — no single-task global window.
  The write is one shuffle-free partitioned parquet write; the manifest
  is one small groupBy over the WRITTEN files (verifying what actually
  landed, not what was planned).
- **Verification**: each manifest row carries the shard's doc count,
  token sum, and an order-independent checksum (``bit_xor`` of per-doc
  ``xxhash64(id, n_tokens)``). ``verify_shards`` recomputes all three
  from the data files and reports any shard that drifted — the cheap
  integrity gate before a training run points at the directory.

Layout::

    <path>/data/shard=N/*.parquet     the documents (all input columns)
    <path>/manifest/*.parquet         one row per shard
    <path>/manifest.json              totals + parameters (driver-sized)

The manifest relation stays a parquet RELATION, not a driver list — at
100 TB with multi-million-token shards there are millions of shards,
and only the json summary (a handful of scalars) ever hits the driver.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knightshift_spark.operators.dedup import stable_hash32
from knightshift_spark.operators.packing import _with_prefix


def assign_shards(
    docs: DataFrame,
    shard_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    salt: str = "",
    n_buckets: int = 256,
) -> DataFrame:
    """Input rows + a ``shard`` column (see module docstring). Pure
    transform — ``write_training_shards`` is the materializing wrapper."""
    if shard_tokens < 1:
        raise ValueError(f"shard_tokens must be >= 1, got {shard_tokens}")
    keyed = docs.withColumn(
        "__key",
        stable_hash32(
            F.concat(F.col(id_col).cast("string"), F.lit(f"|shard|{salt}"))
        ),
    )
    out = _with_prefix(
        keyed, "__key", tokens_col, n_buckets, tiebreak_cols=(id_col,)
    )
    return out.withColumn(
        "shard", F.expr(f"__start DIV {int(shard_tokens)}").cast("bigint")
    ).drop("__key", "__start")


def _shard_stats(data: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    return data.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col).cast("bigint")).alias("n_tokens"),
        F.expr(f"bit_xor(xxhash64(`{id_col}`, `{tokens_col}`))").alias("checksum"),
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    shard_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    salt: str = "",
    n_buckets: int = 256,
) -> dict:
    """Materialize the sharded corpus + manifest (module docstring).
    Returns the driver-sized summary also written to ``manifest.json``."""
    spark = docs.sparkSession
    assigned = assign_shards(
        docs, shard_tokens, id_col, tokens_col, salt, n_buckets
    )
    assigned.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(path, "data")
    )
    # manifest from the WRITTEN files — verifies what landed. Explicit
    # schema: an EMPTY corpus writes no parquet footers to infer from,
    # and readers of a manifest should never re-infer anyway.
    data = spark.read.schema(assigned.schema).parquet(os.path.join(path, "data"))
    stats = _shard_stats(data, id_col, tokens_col)
    stats.write.mode("overwrite").parquet(os.path.join(path, "manifest"))
    row = (
        stats.agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.max("n_tokens"), F.lit(0)).alias("max_shard_tokens"),
        )
        .first()
        .asDict()
    )
    summary = {
        **{k: int(v) for k, v in row.items()},
        "shard_tokens": int(shard_tokens),
        "salt": salt,
        "id_col": id_col,
        "tokens_col": tokens_col,
        "schema": assigned.schema.json(),
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(summary, f)
    return summary


def verify_shards(
    spark, path: str, id_col: str | None = None, tokens_col: str | None = None
) -> DataFrame:
    """Shards whose data files no longer match their manifest row —
    (shard, field, manifest, actual); EMPTY means the corpus verifies.
    One groupBy over the data + a manifest-sized join: the pre-training
    integrity gate."""
    with open(os.path.join(path, "manifest.json")) as f:
        meta = json.load(f)
    id_col = id_col or meta["id_col"]
    tokens_col = tokens_col or meta["tokens_col"]
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(meta["schema"]))
    actual = _shard_stats(
        spark.read.schema(schema).parquet(os.path.join(path, "data")),
        id_col,
        tokens_col,
    )
    manifest = spark.read.parquet(os.path.join(path, "manifest"))
    joined = manifest.alias("m").join(
        actual.alias("a"), "shard", "full_outer"
    )
    checks = []
    for field in ("n_docs", "n_tokens", "checksum"):
        checks.append(
            joined.filter(
                ~F.col(f"m.{field}").eqNullSafe(F.col(f"a.{field}"))
            ).select(
                "shard",
                F.lit(field).alias("field"),
                F.col(f"m.{field}").cast("string").alias("manifest"),
                F.col(f"a.{field}").cast("string").alias("actual"),
            )
        )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
