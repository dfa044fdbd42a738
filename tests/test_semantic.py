"""SemDeDup: clustered embedding near-dup removal (Abbas et al. 2023)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from knightshift_spark.operators.semantic import semantic_dedup, semantic_dedup_pairs


def _clustered_vectors(n_per=8, seed=0):
    """Three well-separated unit-sphere clusters in R^4: tight noise
    around orthogonal anchors, so within-cluster sims are high and
    cross-cluster sims are near zero — within-cluster all-pairs above
    the threshold IS the global all-pairs set."""
    rng = random.Random(seed)
    anchors = [(1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0)]
    rows = []
    i = 0
    for a in anchors:
        for _ in range(n_per):
            v = [x + rng.uniform(-0.05, 0.05) for x in a]
            n = math.sqrt(sum(x * x for x in v))
            rows.append((i, [x / n for x in v]))
            i += 1
    return rows


def _bruteforce_pairs(rows, threshold):
    out = set()
    for i, (ia, va) in enumerate(rows):
        na = math.sqrt(sum(x * x for x in va))
        for ib, vb in rows[i + 1 :]:
            nb = math.sqrt(sum(x * x for x in vb))
            sim = sum(x * y for x, y in zip(va, vb)) / (na * nb)
            if round(sim, 4) >= threshold:
                out.add((ia, ib))
    return out


def test_pairs_match_bruteforce_on_separated_clusters(spark):
    rows = _clustered_vectors()
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(vecs, threshold=0.99, n_clusters=3).collect()
    }
    assert got == _bruteforce_pairs(rows, 0.99)
    assert got  # non-vacuous: the tight clusters do contain near-dups


def test_partition_invariance(spark):
    rows = _clustered_vectors(seed=2)
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = sorted(
        map(tuple, semantic_dedup_pairs(vecs, 0.99, n_clusters=3).collect())
    )
    shuffled = sorted(
        map(
            tuple,
            semantic_dedup_pairs(vecs.repartition(13), 0.99, n_clusters=3).collect(),
        )
    )
    assert base == shuffled


def test_max_cluster_star_pairing_stays_connected(spark):
    """A cluster of identical vectors above the cap: pairs go linear
    (star) instead of quadratic, and the transitive closure still unites
    the whole cluster (one survivor after semantic_dedup)."""
    ident = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(20)]
    lone = [(100, [0.0, 0.0, 0.0, 1.0])]
    vecs = spark.createDataFrame(ident + lone, "vec_id long, embedding array<double>")
    pairs = semantic_dedup_pairs(vecs, 0.99, n_clusters=2, max_cluster=5)
    rows = pairs.collect()
    assert len(rows) == 19  # star: every member pairs with rep 0 only
    assert all(r["id_a"] == 0 for r in rows)
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i, _ in ident + lone], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"]
        for r in semantic_dedup(
            docs, vecs, 0.99, n_clusters=2, max_cluster=5
        ).collect()
    )
    assert kept == [0, 100]  # min-id survivor + the unrelated vector


def test_docs_without_embeddings_are_kept(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "no-embedding")], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"] for r in semantic_dedup(docs, vecs, 0.99, n_clusters=1).collect()
    )
    assert kept == [1, 9]


def test_reuses_provided_centroids(spark):
    """Passing the ANN index's coarse codebook skips the k-means build:
    output equals the self-trained run on the same separated data."""
    from knightshift_spark.operators.similarity import _unit, ivf_centroids

    rows = _clustered_vectors(seed=4)
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_centroids(
        _unit(vecs, "vec_id", "embedding", "__id", "__v"),
        3, id_col="__id", vec_col="__v",
    )
    a = sorted(map(tuple, semantic_dedup_pairs(vecs, 0.99, n_clusters=3).collect()))
    b = sorted(
        map(tuple, semantic_dedup_pairs(vecs, 0.99, centroids=cents).collect())
    )
    assert a == b


def test_rejects_bad_cap(spark):
    vecs = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="max_cluster"):
        semantic_dedup_pairs(vecs, max_cluster=0)


def test_arrow_sim_engine_matches_sql(spark):
    rows = _clustered_vectors(seed=11)
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sql_pairs = sorted(
        map(tuple, semantic_dedup_pairs(vecs, 0.99, n_clusters=3).collect())
    )
    arrow_pairs = sorted(
        map(
            tuple,
            semantic_dedup_pairs(
                vecs, 0.99, n_clusters=3, sim_engine="arrow"
            ).collect(),
        )
    )
    assert sql_pairs == arrow_pairs and sql_pairs
    with pytest.raises(ValueError, match="sim_engine"):
        semantic_dedup_pairs(vecs, sim_engine="gpu")
