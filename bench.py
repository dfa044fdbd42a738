"""Benchmark runner: every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Execution is measured with a ``noop``-format write so the full plan runs
on executors without driver-side row serialization skewing the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knightshift_spark.queries import load_all  # noqa: E402
from knightshift_spark.session import get_spark  # noqa: E402


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    specs = load_all()
    spark = get_spark("bench")

    # JVM/codegen warmup on an unmeasured query
    _run(specs["q14_count"].spark_fn(spark, sf_dir))

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    times: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            _run(spec.spark_fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
