"""Fuzzy join: LSH path vs the exact baseline vs a DuckDB Jaccard
oracle; bucket caps; planted matches across relations."""

from __future__ import annotations

import duckdb

from knightshift_spark.operators.fuzzyjoin import fuzzy_join, fuzzy_join_exact

_LEFT = [
    (1, "the quick brown fox jumps over the lazy dog in the park"),
    (2, "completely different content about databases and storage engines"),
    (3, "a short unrelated note"),
]
_RIGHT = [
    (10, "the quick brown fox jumps over the lazy dog in the yard"),  # ~match of 1
    (20, "databases and storage engines explained for practitioners"),  # overlaps 2
    (30, "nothing in common with anything at all here"),
]


def _mk(spark):
    left = spark.createDataFrame(_LEFT, "doc_id long, text string")
    right = spark.createDataFrame(_RIGHT, "doc_id long, text string")
    return left, right


def _duck_oracle(threshold: float) -> set[tuple[int, int, float]]:
    """Exact bigram-shingle Jaccard over ALL cross pairs (tiny scope)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l(id BIGINT, t VARCHAR); CREATE TABLE r(id BIGINT, t VARCHAR)"
    )
    con.executemany("INSERT INTO l VALUES (?, ?)", _LEFT)
    con.executemany("INSERT INTO r VALUES (?, ?)", _RIGHT)
    rows = con.execute(
        """
        WITH ls AS (
          SELECT DISTINCT id, g FROM (
            SELECT id, unnest(list_transform(range(1, len(tk)),
                   i -> tk[i] || ' ' || tk[i+1])) AS g
            FROM (SELECT id, string_split_regex(trim(lower(t)), '\\s+') tk FROM l))),
        rs AS (
          SELECT DISTINCT id, g FROM (
            SELECT id, unnest(list_transform(range(1, len(tk)),
                   i -> tk[i] || ' ' || tk[i+1])) AS g
            FROM (SELECT id, string_split_regex(trim(lower(t)), '\\s+') tk FROM r))),
        lsz AS (SELECT id, COUNT(DISTINCT g) n FROM ls GROUP BY id),
        rsz AS (SELECT id, COUNT(DISTINCT g) n FROM rs GROUP BY id),
        inter AS (
          SELECT ls.id AS a, rs.id AS b, COUNT(DISTINCT ls.g) AS ni
          FROM ls JOIN rs ON ls.g = rs.g GROUP BY 1, 2)
        SELECT a, b, ROUND(CAST(ni AS DOUBLE) / (lsz.n + rsz.n - ni), 4) AS j
        FROM inter JOIN lsz ON lsz.id = a JOIN rsz ON rsz.id = b
        """
    ).fetchall()
    con.close()
    return {(a, b, j) for a, b, j in rows if j >= threshold}


def test_exact_path_matches_duckdb_oracle(spark):
    left, right = _mk(spark)
    got = {
        (r["left_id"], r["right_id"], r["jaccard"])
        for r in fuzzy_join_exact(left, right, threshold=0.1).collect()
    }
    assert got == _duck_oracle(0.1)
    assert any(a == 1 and b == 10 for a, b, _ in got)  # the planted match


def test_lsh_path_finds_high_sim_and_scores_exactly(spark):
    left, right = _mk(spark)
    exact = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in fuzzy_join_exact(left, right, threshold=0.5).collect()
    }
    lsh = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in fuzzy_join(left, right, threshold=0.5, num_hashes=16, bands=8).collect()
    }
    # high-similarity pairs survive banding, and their scores are the
    # EXACT rescore — identical to the baseline's numbers
    assert (1, 10) in lsh
    for pair, j in lsh.items():
        assert exact[pair] == j
    assert set(lsh) <= set(exact)


def test_bucket_cap_guard_and_skip(spark):
    left, right = _mk(spark)
    import pytest

    with pytest.raises(ValueError, match="max_bucket"):
        fuzzy_join(left, right, max_bucket=0)
    # a cap of 1 skips every shared bucket on the duplicated side
    dup_left = left.unionByName(
        spark.createDataFrame(
            [(100 + i, _LEFT[0][1]) for i in range(4)], "doc_id long, text string"
        )
    )
    got = fuzzy_join(dup_left, right, threshold=0.5, max_bucket=1).collect()
    ids = {r["left_id"] for r in got}
    assert 100 not in ids or len(got) < 10  # capped buckets don't explode
