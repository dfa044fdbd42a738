"""JDBC source/sink helpers (OP-03 scan, OP-06 merge sink).

The reference reads/writes Postgres through SQLAlchemy one row at a time
(select-then-update-or-insert per game, ``db/game_upsert.py:84-110``);
the engine equivalent is Spark's JDBC relation with explicit partitioning
so reads parallelize, plus a ``foreachBatch`` upsert writer that stages
each micro-batch into a temp table and executes ONE set-based merge
statement through the JVM ``DriverManager`` — same end state as the
reference's per-row upsert, n rows per round-trip instead of 1.

Dialects: ANSI ``MERGE INTO`` (Derby/Oracle/MSSQL/DB2) or Postgres
``INSERT … ON CONFLICT DO UPDATE`` — picked from the JDBC URL. The merge
path is integration-tested against embedded Derby (ships with Spark);
parquet remains the canonical tested storage (SURVEY.md §1.3).
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


def merge_sql(
    target_table: str,
    staged_table: str,
    columns: list[str],
    key_cols: list[str],
    url: str,
    casts: dict[str, str] | None = None,
) -> str:
    """Set-based upsert statement for the target's dialect.

    Postgres URLs get ``INSERT … ON CONFLICT (keys) DO UPDATE``; everything
    else gets ANSI ``MERGE INTO`` (Derby, Oracle, MSSQL, DB2). Matches the
    reference's update-if-exists-else-insert per key
    (``db/game_upsert.py:92-105``) in one statement.

    ``casts`` maps staged column → SQL type; those staged references are
    wrapped in ``CAST``. Needed when the dialect stages a type that can't
    sit in a comparison/assignment (Derby stages Spark strings as CLOB).
    """
    # Spark's JDBC writer quotes identifiers when creating the staged
    # table (case-sensitive, exactly as in the DataFrame); the target is
    # assumed DDL-created with unquoted (case-insensitive) names — so
    # staged-side references are quoted, target-side left bare.
    casts = casts or {}

    def ref(c: str, prefix: str = "s.") -> str:
        r = f'{prefix}"{c}"'
        return f"CAST({r} AS {casts[c]})" if c in casts else r

    def s(c: str) -> str:
        return ref(c)

    non_keys = [c for c in columns if c not in key_cols]
    if url.startswith("jdbc:postgresql"):
        cols = ", ".join(columns)
        sel = ", ".join(ref(c, prefix="") for c in columns)
        keys = ", ".join(key_cols)
        sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in non_keys)
        action = f"DO UPDATE SET {sets}" if non_keys else "DO NOTHING"
        return (
            f"INSERT INTO {target_table} ({cols}) "
            f"SELECT {sel} FROM {staged_table} "
            f"ON CONFLICT ({keys}) {action}"
        )
    on = " AND ".join(f"t.{k} = {s(k)}" for k in key_cols)
    ins_cols = ", ".join(columns)
    ins_vals = ", ".join(s(c) for c in columns)
    matched = (
        "WHEN MATCHED THEN UPDATE SET "
        + ", ".join(f"t.{c} = {s(c)}" for c in non_keys)
        + " "
        if non_keys
        else ""
    )
    return (
        f"MERGE INTO {target_table} t USING {staged_table} s ON ({on}) "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def execute_jdbc(spark: SparkSession, url: str, *statements: str) -> None:
    """Run DDL/DML statements on the database through the driver JVM's
    ``java.sql.DriverManager`` (the JDBC driver jar is already on Spark's
    classpath — no extra client library)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
    try:
        stmt = conn.createStatement()
        try:
            for s in statements:
                stmt.executeUpdate(s)
        finally:
            stmt.close()
    finally:
        conn.close()


def upsert_writer(target_table: str, key_cols: list[str], url: str, **options: str):
    """foreachBatch sink factory: merge each micro-batch into a JDBC table.

    Stages the batch into ``{target}__stage_{batch_id}`` with Spark's JDBC
    writer, executes ONE set-based merge (``merge_sql``) through the JVM
    ``DriverManager``, then drops the stage — the set-based equivalent of
    the reference's per-row upsert (``db/game_upsert.py:84-110``), one
    DB round-trip per micro-batch instead of one per row.

    ``options`` pass through to the JDBC writer. Derby stages Spark
    strings as CLOB (its dialect's StringType mapping — and NULLs are
    bound with the CLOB type code, so overriding the stage DDL via
    ``createTableColumnTypes`` breaks on the first NULL); CLOBs can't sit
    in a MERGE comparison or assignment, so staged string columns are
    CAST to VARCHAR inside the merge statement instead.
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
        casts = None
        if url.startswith("jdbc:derby"):
            casts = {
                f.name: "VARCHAR(32672)"  # Derby's max VARCHAR length
                for f in batch_df.schema.fields
                if f.dataType.simpleString() == "string"
            }
        spark = batch_df.sparkSession
        try:
            execute_jdbc(
                spark,
                url,
                merge_sql(target_table, staged, batch_df.columns, key_cols, url, casts),
            )
        finally:
            execute_jdbc(spark, url, f"DROP TABLE {staged}")

    return write_batch
