"""Example — operating a TxnTable over its lifetime.

The write path (merge / transaction) is covered by the pipeline
examples; this one is the MAINTENANCE story a table accumulates over
months of ingestion: growth outpaces the create()-time bucket count,
audits need "what did the table say last Tuesday", a bad batch needs
undoing, and the whole commit log should live in the object store next
to the data. Runnable as-is against any local dir:

    python examples/txntable_maintenance.py /tmp/ks-demo

Every operation here is one atomic commit with snapshot isolation —
readers running concurrently never see a half-applied state.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from knightshift_spark.session import tune_session  # noqa: E402
from knightshift_spark.sources.txntable import (  # noqa: E402
    MemoryCommitBackend,
    TxnTable,
)


def main(base: str) -> None:
    spark = tune_session(
        SparkSession.builder.master("local[8]").getOrCreate()
    )

    # The commit log lives behind CommitBackend: filesystem by default
    # (os.link as the conditional PUT), or any object store — here the
    # in-process model of one (S3-style conditional PUT + consistent
    # LIST). Not one log JSON touches the local disk with this backend;
    # the parquet data files are read by Spark natively either way.
    store = MemoryCommitBackend()
    table = TxnTable.create(
        spark,
        f"{base}/games",
        keys=["game_id"],
        schema="game_id long, result string, rating int",
        n_buckets=4,  # sized to day-1 data — deliberately small
        # CHECK constraints (r12): every write path validates in-plan;
        # a violating batch fails BEFORE the commit
        constraints={"rating_range": "rating BETWEEN 0 AND 4000"},
        backend=store,
    )

    # months of ingestion, compressed: appends + merges + one txn
    table.append(spark.range(0, 1000).select(
        F.col("id").alias("game_id"),
        F.lit("1-0").alias("result"),
        F.lit(1500).cast("int").alias("rating"),
    ))
    t_last_tuesday = time.time()  # the audit moment
    with table.transaction():  # one commit, both statements or neither
        table.merge(spark.createDataFrame(
            [(7, "0-1", 1600)], "game_id long, result string, rating int",
        ), order_by=["rating"])
        table.delete_where(F.col("game_id") == 13, rewrite_all=False)

    # 0. health check first — one driver-side metadata pass says which
    # maintenance op (if any) the table actually wants
    print("report:", table.maintenance_report())

    # 1. growth: the 4-bucket layout now makes every merge rewrite 25%
    # of the table. suggest_n_buckets sizes a power-of-two count from
    # live bytes; rebucket() re-hashes every key as ONE commit and
    # conflicts with every concurrent writer (maintenance-window op).
    n = max(table.suggest_n_buckets(target_bucket_mb=256.0), 16)
    table.rebucket(n)
    print("rebucketed to", n, "buckets at version", table.version())

    # 2. audit: timestamp time travel (monotonized commit clocks)
    v = table.version_as_of(t_last_tuesday)
    print("as of the audit moment the table was at version", v,
          "with", table.snapshot_as_of(t_last_tuesday).count(), "rows")

    # 3. undo: restore() reactivates the old file set by reference —
    # zero data rewritten, the bad commits stay in history for audit,
    # and a restore across the rebucket reverts the modulus with it.
    table.restore(v)
    print("restored; history:",
          [(h["version"], h["op"]) for h in table.history()])
    # detailed=True adds DESCRIBE HISTORY-shape operation metrics off
    # the commit payloads — mode ("dv" = merge-on-read), entry counts,
    # rows and masked positions in the committed entries — the write-
    # amplification audit trail, no replay and no file reads
    for h in table.history(detailed=True):
        print(f"  v{h['version']:>3} {h['op']:<8}",
              f"mode={h['mode'] or '-':<4} adds={h['n_adds']}",
              f"removes={h['n_removes']} rows={h['rows_in_adds']}",
              f"dv_rows={h['dv_rows_in_adds']}")

    # 4. hygiene: compact small files, then drop data no live-or-
    # recent snapshot references (time travel inside retention keeps
    # working; older reads fail loudly, never wrongly).
    table.compact()
    table.vacuum(retention_s=3600.0)       # bounds the DATA files
    table.expire_log(retention_s=30 * 24 * 3600.0)  # bounds the LOG

    # 5. clustering (r12): adopt a Z-order layout online — the spec
    # persists in the commit log, later writes keep it, and
    # maintenance_report's clustering_amplification says when churn
    # has degraded it enough to re-cluster.
    table.compact(zorder_by=["rating"], target_file_rows=10_000)
    print("clustered; amplification:",
          table.maintenance_report()["clustering_amplification"])

    # 6. ...or wire ONE line into the scheduler and let the table run
    # exactly the ops its own report recommends (rebucket > re-cluster
    # > compact, then the retention sweeps):
    print("scheduled pass:", table.maintain(dry_run=True)["actions"])
    table.maintain()
    print("final row count:", table.snapshot().count())

    # 7. operator surfaces (late r13): the file inventory as a
    # relation (SQL over skew / mask debt / fragmentation), the
    # DESCRIBE DETAIL dict, metadata-only count, and vacuum's
    # look-before-you-leap
    table.files().orderBy("bucket").show(4, truncate=False)
    d = table.detail()
    print("detail:", {k: d[k] for k in ("version", "live_rows", "dv_rows",
                                        "n_buckets", "log_tail_commits")})
    print("metadata count:", table.count(), "(no Spark job)")
    print("vacuum would delete:", table.vacuum(retention_s=0.0,
                                               dry_run=True))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ks-txn-demo")
