"""SQL-string interface: pure-SQL results must equal the DataFrame API
results for equivalent queries (one engine, two frontends)."""

from __future__ import annotations

from knightshift_spark.queries import load_all
from knightshift_spark.sql import sql
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_equals_dataframe_q15(spark):
    df_api = load_all()["q15_pricing_summary"].spark_fn(spark, SF_SMOKE)
    via_sql = sql(
        spark,
        SF_SMOKE,
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue,
           ROUND(percentile(l_quantity, 0.5), 4) AS p50_qty,
           ROUND(percentile(l_quantity, 0.9), 4) AS p90_qty
           FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    )
    assert _rows(df_api) == _rows(via_sql)


def test_sql_equals_dataframe_q16(spark):
    df_api = load_all()["q16_join_agg"].spark_fn(spark, SF_SMOKE)
    via_sql = sql(
        spark,
        SF_SMOKE,
        """SELECT n_name, COUNT(*) AS n FROM customer
           JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""",
    )
    assert _rows(df_api) == _rows(via_sql)


def test_sql_window_and_qualify_style(spark):
    out = sql(
        spark,
        SF_SMOKE,
        """SELECT * FROM (
             SELECT user_id, event_id,
                    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             FROM events) WHERE rn = 1""",
    )
    assert out.count() == out.select("user_id").distinct().count()
