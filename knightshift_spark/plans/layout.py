"""Physical-layout operations: skew diagnosis and small-file compaction.

Two ops a 100 TB deployment runs constantly but Spark doesn't package:

- ``key_skew_report`` measures WHETHER a join/agg key needs mitigation
  before you pay for it. Salting (``partitioning.salted_join``), AQE
  skew splitting, and broadcast all have costs; the decision input is
  the key-frequency distribution, which this computes in one shuffle
  plus one tiny aggregate over the per-key counts (the counts relation
  is #distinct-keys rows — already reduced; percentiles over it use the
  built-in approx sketch, not a full sort).

- ``compact_parquet`` fixes the small-file problem streaming sinks and
  fine-grained partition overwrites accumulate (every file is a task +
  a namenode entry + a scan-planning cost; thousands of KB-sized files
  make a TB-sized table slow out of proportion). It sizes the output
  file count from the MEASURED input bytes against a target file size,
  and rewrites with either round-robin repartition (pure compaction) or
  ``repartitionByRange`` (compaction + re-clustering so min/max file
  statistics stay selective — pair with ``plans.zorder`` for
  multi-column clustering).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def key_counts(df: DataFrame, keys: list[str]) -> DataFrame:
    """Per-key row counts — the skew histogram (one map-side-combinable
    shuffle)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def key_skew_report(
    df: DataFrame,
    keys: list[str],
    broadcast_threshold_rows: int = 1_000_000,
    skew_factor: float = 8.0,
) -> DataFrame:
    """One-row skew diagnosis of a prospective join/agg key:
    (n_rows, n_keys, max_key_rows, mean_key_rows, p50/p99_key_rows,
    skew_ratio, advice). ``advice`` is the mitigation this engine's own
    operators would pick: 'broadcast' when the whole relation is small
    enough to ship, 'salt-or-aqe' when the hottest key dwarfs the mean
    by ``skew_factor``, else 'hash-partition'."""
    counts = key_counts(df, keys)
    rep = counts.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_key_rows"),
        F.round(F.avg("n"), 2).alias("mean_key_rows"),
        F.percentile_approx("n", 0.5).alias("p50_key_rows"),
        F.percentile_approx("n", 0.99).alias("p99_key_rows"),
    ).withColumn(
        "skew_ratio",
        F.round(F.col("max_key_rows") / F.col("mean_key_rows"), 2),
    )
    return rep.withColumn(
        "advice",
        F.when(
            F.col("n_rows") <= broadcast_threshold_rows, F.lit("broadcast")
        )
        .when(
            F.col("skew_ratio") >= skew_factor, F.lit("salt-or-aqe")
        )
        .otherwise(F.lit("hash-partition")),
    )


def top_keys(df: DataFrame, keys: list[str], k: int = 20) -> DataFrame:
    """The k hottest keys with counts (deterministic order) — the input
    to targeted mitigation (e.g. salting ONLY the hot keys, or a
    hot-key broadcast split)."""
    return (
        key_counts(df, keys)
        .orderBy(F.col("n").desc(), *[F.col(c) for c in keys])
        .limit(k)
    )


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 256,
    order_by: list[str] | None = None,
) -> dict:
    """Rewrite a parquet directory into ~``target_file_mb`` files.

    File count = ceil(measured_bytes / target) — measured from the
    actual input listing, not guessed from row counts (compression
    ratios vary too much to infer). ``order_by`` switches the rewrite
    from round-robin ``repartition`` to ``repartitionByRange`` +
    within-partition sort, so compaction doubles as re-clustering and
    each output file covers a tight key range (min/max pruning stays
    sharp). Returns a summary dict {files_before, files_after, bytes,
    target_files}. Writes to ``out_path`` — atomic swap is the
    caller's filesystem move; compaction never rewrites in place."""
    bytes_in = _dir_bytes(in_path)
    files_before = sum(
        1
        for _root, _d, fs in os.walk(in_path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(bytes_in / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    if order_by:
        out = df.repartitionByRange(n_files, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    files_after = sum(
        1
        for _root, _d, fs in os.walk(out_path)
        for f in fs
        if f.endswith(".parquet")
    )
    return {
        "bytes": bytes_in,
        "files_before": files_before,
        "files_after": files_after,
        "target_files": n_files,
    }
