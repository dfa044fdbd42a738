"""Example Airflow DAG — the engine deployed on the reference's schedule.

Mirrors the reference DAG (``airflow/dags/knightshift_dag.py``: health
gate → ingest → clean → enrich, ``0 */2 * * *``, 1 retry / 2 min) but
each task is a ``spark-submit`` of the engine's library entry points
instead of a subprocess Python script against Postgres. NOT imported by
the engine or its tests — drop it into an Airflow deployment's dags/.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from airflow import DAG  # type: ignore[import-not-found]
from airflow.providers.apache.spark.operators.spark_submit import (  # type: ignore[import-not-found]
    SparkSubmitOperator,
)

PGN_DIR = "{{ var.value.ks_pgn_dir }}"
WAREHOUSE = "{{ var.value.ks_warehouse_dir }}"

default_args = {
    "retries": 1,  # reference: 1 retry, 2 min delay (knightshift_dag.py:80-95)
    "retry_delay": timedelta(minutes=2),
}

with DAG(
    dag_id="knightshift_spark_pipeline",
    schedule="0 */2 * * *",  # reference cadence
    start_date=datetime(2025, 1, 1),
    catchup=False,
    max_active_runs=1,  # reference: max 1 active run
    default_args=default_args,
) as dag:
    # run_all handles the health gate + all three stages in one Spark app;
    # a 1000-executor deployment would add --num-executors/--conf here.
    full_pipeline = SparkSubmitOperator(
        task_id="run_pipeline",
        application_args=[PGN_DIR, WAREHOUSE],
        application="-m knightshift_spark.pipelines.run_all",
        name="knightshift-pipeline",
    )
