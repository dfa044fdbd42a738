"""SparkSession factory with engine-canonical configuration.

Semantics pinned here (see SURVEY.md §4 "Physical-execution decisions"):

- ``spark.sql.session.timeZone=UTC`` — the reference stamps rows with naive
  UTC (``datetime.utcnow()``, reference ``db/game_upsert.py:80``); UTC keeps
  timestamp collection/rendering identical to a naive-UTC oracle (DuckDB).
- ``spark.sql.ansi.enabled=false`` — the reference's casts are
  NULL-on-error (``game_upsert.py:21-51``); non-ANSI ``cast`` matches that
  try-cast behavior. Query code still prefers explicit ``try_*`` functions
  so it is correct even on an ANSI session the engine did not create.
- AQE on — runtime coalescing of shuffle partitions and skew-join splitting
  are the first line of defense at 100 TB.
- Arrow on — every pandas interchange (mapInPandas/applyInPandas UDF paths)
  is batched columnar, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime (SET-able) confs we also apply defensively to sessions we did not
# build — e.g. the verify driver's session — so semantics stay pinned.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # PGN header maps dedup duplicate keys last-wins (reference parser
    # overwrites repeated tags: utils/pgn_parser.py:33-36).
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    # TIMESTAMP(NANOS) parquet (which Spark otherwise rejects) reads as
    # long; readers sniff the dtype and convert to canonical micros
    # (tables.load_table / streaming.stream_events). Pinned here so no
    # library read ever mutates a caller's session conf.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # local[32] default; real clusters override via spark-submit conf.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
}


def get_spark(app_name: str = "knightshift-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the canonical engine session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    for tests; on a cluster the master comes from spark-submit and this
    argument is left None.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # managed-table (bucketing) support without polluting the repo:
        # warehouse + derby metastore live under /tmp
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/knightshift-warehouse"),
        )
        .config(
            "spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/knightshift-derby"
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable canonical confs to an existing session.

    Safe and idempotent; used by the query layer when handed a session the
    engine did not construct (driver harness, notebooks).
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static confs on a running session: leave as-is
            pass
    return spark
