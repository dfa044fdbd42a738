"""Driver-contract smoke: entry() runs, queries()/oracle_sql() consistent,
and a sampled subset of oracle parity holds at sf0.001 (the full grid runs
in tools/check_parity.py)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from knightshift_spark.tables import TABLE_NAMES
from tests.conftest import SF_SMOKE

PARITY_SAMPLE = [
    "q01_filter_scan",
    "q60_array_agg",
    "q15_pricing_summary",
    "q17_three_way_join",
    "q28_pgn_pipeline",
    "q31_minhash",
    "q33_knn_cosine",
    "q39_sessionize",
]


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) == 6  # q15: flags + n + revenue + p50/p90


def test_query_and_oracle_keys_align(spark):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 40
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


@pytest.mark.parametrize("name", PARITY_SAMPLE)
def test_oracle_parity_sample(spark, name):
    import sys

    sys.path.insert(0, "tools")
    from check_parity import compare

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    sdf = qs[name](spark, SF_SMOKE).toPandas()
    ddf = con.execute(osql[name]).fetch_arrow_table().to_pandas(date_as_object=True)
    assert compare(name, sdf, ddf) == []
