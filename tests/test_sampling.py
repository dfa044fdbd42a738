"""Deterministic sampling: reproducibility, cross-engine agreement with a
DuckDB oracle on identical md5 arithmetic, and plan shape (broadcast join,
no corpus-side shuffle)."""

from __future__ import annotations

import duckdb

from knightshift_spark.operators.sampling import hash_sample, stratified_sample

SF_DIR = "/root/testdata/sf0.001"

# same 32-bit md5-prefix hash as operators.dedup.stable_hash32
_HASH = (
    "list_sum(list_transform(range(1, 9), i -> "
    "CAST((strpos('0123456789abcdef', substr(md5({x}), i, 1)) - 1) AS BIGINT)"
    " * (CAST(1 AS BIGINT) << (4 * (8 - i)))))"
)


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hash_sample_deterministic_and_engine_portable(spark):
    kept = sorted(
        r["doc_id"] for r in hash_sample(_docs(spark), 0.3, salt="s1").collect()
    )
    again = sorted(
        r["doc_id"] for r in hash_sample(_docs(spark), 0.3, salt="s1").collect()
    )
    assert kept == again  # reproducible

    con = duckdb.connect()
    h = _HASH.format(x="doc_id || '|s1'")
    oracle = sorted(
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet') "
            f"WHERE {h} % 1048576 < {int(0.3 * 1048576)}"
        ).fetchall()
    )
    assert kept == oracle  # identical selection in another engine

    n_total = _docs(spark).count()
    assert 0.2 < len(kept) / n_total < 0.4  # close to the asked fraction

    other = sorted(
        r["doc_id"] for r in hash_sample(_docs(spark), 0.3, salt="s2").collect()
    )
    assert other != kept  # a new salt is a fresh draw


def test_stratified_sample_mixture(spark):
    docs = _docs(spark)
    fractions = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    out = stratified_sample(docs, fractions, salt="mix")
    by_src = {
        r["source"]: r["count"] for r in out.groupBy("source").count().collect()
    }
    totals = {
        r["source"]: r["count"] for r in docs.groupBy("source").count().collect()
    }
    assert by_src["src0"] == totals["src0"]          # keep-all stratum intact
    assert 0.25 < by_src["src1"] / totals["src1"] < 0.75
    assert "src2" not in by_src                      # dropped stratum
    # strata not in the map default to 0.0
    assert set(by_src) <= {"src0", "src1"}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan   # corpus side never shuffles


def test_deterministic_shuffle_is_a_stable_total_order(spark):
    from knightshift_spark.operators.sampling import deterministic_shuffle

    docs = _docs(spark).select("doc_id")
    a = [r.doc_id for r in deterministic_shuffle(docs, salt="ep0").collect()]
    b = [r.doc_id for r in deterministic_shuffle(docs, salt="ep0").collect()]
    c = [r.doc_id for r in deterministic_shuffle(docs, salt="ep1").collect()]
    assert a == b                      # same salt → same permutation
    assert a != c                      # new salt → new permutation
    assert sorted(a) == sorted(c)      # ... of the same rows
    assert a != sorted(a)              # actually shuffled, not id order

    # explicit-partition variant yields the same global order when files
    # are concatenated in partition order
    from pyspark.sql import functions as F

    parts = deterministic_shuffle(docs, salt="ep0", n_partitions=4)
    rows = parts.withColumn("pid", F.spark_partition_id()).collect()
    by_part = sorted((r.pid, i) for i, r in enumerate(rows))
    concat = [rows[i].doc_id for _, i in by_part]
    assert concat == a


def test_cap_per_group_quota_and_determinism(spark):
    from knightshift_spark.operators.sampling import cap_per_group

    docs = _docs(spark)
    capped = cap_per_group(docs, 25, group_col="lang", salt="q")
    counts = {r["lang"]: r["count"] for r in capped.groupBy("lang").count().collect()}
    originals = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for lang, n in counts.items():
        assert n == min(25, originals[lang])
    # deterministic: same salt picks the same rows
    ids1 = sorted(r.doc_id for r in capped.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in cap_per_group(docs, 25, group_col="lang", salt="q").select("doc_id").collect()
    )
    assert ids1 == ids2
    # a different salt redraws (overwhelmingly likely to differ)
    ids3 = sorted(
        r.doc_id
        for r in cap_per_group(docs, 25, group_col="lang", salt="r").select("doc_id").collect()
    )
    assert ids1 != ids3


def test_numeric_histogram_matches_duckdb(spark):
    """Equi-width histogram vs a DuckDB oracle over the same parquet —
    same bins, same counts, top edge inclusive."""
    import duckdb

    from tests.conftest import SF_SMOKE
    from knightshift_spark.operators.profiling import numeric_histogram
    from knightshift_spark.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    got = {
        r["bin"]: r["n"]
        for r in numeric_histogram(li, "l_quantity", bins=7).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
    )
    lo, hi = con.execute(
        "SELECT MIN(l_quantity), MAX(l_quantity) FROM lineitem"
    ).fetchone()
    width = (hi - lo) / 7
    want = dict(
        con.execute(
            f"""SELECT LEAST(CAST(FLOOR((l_quantity - {lo}) / {width}) AS INT), 6) AS bin,
                       COUNT(*) FROM lineitem WHERE l_quantity IS NOT NULL
                GROUP BY 1"""
        ).fetchall()
    )
    assert got == want and sum(got.values()) > 0


def test_numeric_histogram_edges(spark):
    from knightshift_spark.operators.profiling import numeric_histogram

    df = spark.createDataFrame(
        [(0.0,), (5.0,), (10.0,), (None,)], "x double"
    )
    rows = {r["bin"]: r for r in numeric_histogram(df, "x", bins=2).collect()}
    # bins are [0,5) and [5,10] — the boundary value 5 opens bin 1 and
    # the max value 10 lands in the LAST bin, not a phantom bin 2
    assert rows[0]["n"] == 1 and rows[1]["n"] == 2
    assert rows[0]["lo"] == 0.0 and rows[1]["hi"] == 10.0
    # degenerate range: everything in bin 0
    flat = spark.createDataFrame([(3.0,), (3.0,)], "x double")
    frows = numeric_histogram(flat, "x", bins=4).collect()
    assert len(frows) == 1 and frows[0]["bin"] == 0 and frows[0]["n"] == 2
    # pinned bounds exclude out-of-range rows
    pinned = numeric_histogram(df, "x", bins=2, lo=0.0, hi=5.0).collect()
    assert sum(r["n"] for r in pinned) == 2
    import pytest

    with pytest.raises(ValueError, match="bins"):
        numeric_histogram(df, "x", bins=0)


def test_numeric_histogram_one_pinned_bound_empty_column(spark):
    # ADVICE r5 #2: pinning ONE bound on an all-NULL/empty column must
    # return the documented empty result, not raise on the other bound
    from knightshift_spark.operators.profiling import numeric_histogram

    empty = spark.createDataFrame([], "v double")
    assert numeric_histogram(empty, "v", bins=4, lo=0.0).count() == 0
    assert numeric_histogram(empty, "v", bins=4, hi=10.0).count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    assert numeric_histogram(nulls, "v", bins=4, lo=0.0).count() == 0


def test_split_corpus_partitions_exactly(spark):
    """Every row in exactly one split; proportions near the requested
    fractions; deterministic across runs and partitionings; a new salt
    re-deals; fractions must sum to 1."""
    import pytest

    from knightshift_spark.operators.sampling import split_corpus

    docs = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    out = split_corpus(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 5000  # a partition: nothing dropped
    assert set(counts) == {"train", "val", "test"}
    assert 0.77 < counts["train"] / 5000 < 0.83
    assert 0.07 < counts["val"] / 5000 < 0.13
    # deterministic + partition-invariant
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, split_corpus(docs.repartition(17), {"train": 0.8, "val": 0.1, "test": 0.1}).collect()))
    assert a == b
    # different salt re-deals (some rows move)
    c = sorted(map(tuple, split_corpus(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v2").collect()))
    assert a != c
    with pytest.raises(ValueError, match="sum to 1"):
        split_corpus(docs, {"train": 0.8, "val": 0.1})
    with pytest.raises(ValueError, match="negative"):
        split_corpus(docs, {"train": 1.5, "val": -0.5})


def test_split_corpus_consistent_with_hash_sample(spark):
    """The 'train' range of split_corpus IS hash_sample's keep set at the
    same fraction and salt — splits and samples compose predictably."""
    from knightshift_spark.operators.sampling import hash_sample, split_corpus

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    split = split_corpus(docs, {"train": 0.3, "rest": 0.7}, salt="s")
    train_ids = {r["doc_id"] for r in split.filter("split = 'train'").collect()}
    sample_ids = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="s").collect()}
    assert train_ids == sample_ids
