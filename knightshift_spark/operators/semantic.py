"""Semantic deduplication — embedding-space near-dup removal at scale.

SemDeDup (Abbas et al. 2023, public method): cluster the corpus
embeddings with k-means, then compare pairs ONLY within a cluster —
semantic duplicates (paraphrases, template re-renders, near-identical
passages) sit close in embedding space, so cross-cluster comparisons are
overwhelmingly wasted work. This is the embedding twin of the banded-
MinHash text path, with a LEARNED partition instead of a hashed one:

- candidate volume ∝ cluster occupancy, never all-pairs;
- the coarse quantizer is the same deterministic k-means‖ build the IVF
  ANN index uses (``similarity.ivf_centroids``) — one codebook can serve
  both the ANN index and the dedup pass;
- ``max_cluster`` bounds within-cluster expansion exactly like the LSH
  paths' ``max_bucket``: above the cap a cluster switches to STAR
  pairing against its min-id representative (linear, stays connected
  under the transitive closure every dedup consumer applies);
- recall < 1.0 by design: a duplicate pair straddling a cluster
  boundary is missed — raise ``n_clusters`` resolution down or run the
  SRP-LSH path (``similarity.neardup_pairs_lsh``) when hash-style
  recall characteristics fit better.

The keep decision reuses the engine's closure machinery
(``dedup.dedup_keep_list``): pairs → connected components → min-id
survivor per cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knightshift_spark.operators.dedup import (
    annotate_bucket_occupancy,
    dedup_keep_list,
)
from knightshift_spark.operators.similarity import (
    _unit,
    assign_ivf_cluster,
    dot,
    ivf_centroids,
)


def semantic_dedup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 8,
    centroids: list[list[float]] | None = None,
    max_cluster: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_engine: str = "sql",
) -> DataFrame:
    """Within-cluster cosine near-dup pairs: (id_a, id_b, sim) with
    id_a < id_b, sim rounded to 4. Pass ``centroids`` to reuse an
    existing IVF codebook (the ANN index's coarse quantizer); otherwise
    a deterministic k-means‖ build runs on the normalized vectors.
    ``sim_engine="arrow"`` swaps the pair rescore for a vectorized numpy
    einsum (see ``_arrow_pair_sims`` for the determinism trade)."""
    if max_cluster is not None and max_cluster < 1:
        raise ValueError(f"max_cluster must be >= 1, got {max_cluster}")
    if sim_engine not in ("sql", "arrow"):
        raise ValueError(f"sim_engine must be 'sql' or 'arrow', got {sim_engine!r}")
    unit = _unit(vectors, id_col, vec_col, "__id", "__v")
    cents = centroids if centroids is not None else ivf_centroids(
        unit, n_clusters, id_col="__id", vec_col="__v"
    )
    if not cents:
        return unit.sparkSession.createDataFrame(
            [], f"id_a {vectors.schema[id_col].dataType.simpleString()}, "
                f"id_b {vectors.schema[id_col].dataType.simpleString()}, sim double"
        )
    dim = len(cents[0])
    # null vectors are dropped EXPLICITLY (cheap pushable predicate),
    # then the cluster id is coalesced non-nullable: a nullable join key
    # makes every join clone its isnotnull(...) null-safety check —
    # including the FULL k-centroid assignment expression — into the
    # scan's DataFilters, evaluating the assignment twice per row
    # (measured 2x wall on this path; the sentinel never fires because
    # nulls are already gone)
    assigned = unit.filter(F.col("__v").isNotNull()).select(
        "__id",
        "__v",
        F.coalesce(
            assign_ivf_cluster(F.col("__v"), cents), F.lit(-1)
        ).alias("__cid"),
    )
    a = assigned.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"), "__cid"
    )
    b = assigned.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), "__cid"
    )
    if max_cluster is None:
        cand = a.join(b, "__cid").filter(F.col("id_a") < F.col("id_b"))
    else:
        bs = annotate_bucket_occupancy(b, ["__cid"], "id_b")
        # both dense sides project from the window subtree: shared
        # exchange + inherited (__cid) partitioning (the q31b lesson)
        small = bs.filter(F.col("__n") <= max_cluster).select(
            "__cid", "id_b", "__vb"
        )
        dense = (
            small.select(
                F.col("id_b").alias("id_a"), F.col("__vb").alias("__va"), "__cid"
            )
            .join(small, "__cid")
            .filter(F.col("id_a") < F.col("id_b"))
        )
        star = (
            bs.filter((F.col("__n") > max_cluster) & (F.col("id_b") != F.col("__rep")))
            .select("__cid", "id_b", "__vb", F.col("__rep").alias("id_a"))
            .join(a, ["__cid", "id_a"])
        )
        cand = dense.unionByName(star.select(*dense.columns))
    # unit vectors: cosine == dot
    if sim_engine == "arrow":
        return _arrow_pair_sims(cand, threshold)
    return (
        cand.select(
            "id_a", "id_b", F.round(dot("__va", "__vb", dim), 4).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )


def _arrow_pair_sims(cand: DataFrame, threshold: float) -> DataFrame:
    """Candidate-pair rescoring as one vectorized einsum per Arrow batch
    — same dots, same left-to-right... no: numpy pairwise sums reduce in
    a different order than the SQL fold, so values can differ in the
    last ulp. Rounding to 4 decimals absorbs that in practice but is NOT
    a bitwise guarantee; the default engine stays "sql" and the tests
    assert equality on well-separated data only. Use this path when the
    pair volume makes the interpreted per-element fold the bottleneck
    (measured ~3x on dense within-cluster pairs at d=64)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            cand.schema["id_a"],
            cand.schema["id_b"],
            T.StructField("sim", T.DoubleType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            va = np.stack(list(pdf["__va"]))
            vb = np.stack(list(pdf["__vb"]))
            sims = np.round(np.einsum("ij,ij->i", va, vb), 4)
            keep = sims >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"][keep],
                    "id_b": pdf["id_b"][keep],
                    "sim": sims[keep],
                }
            )

    return cand.select("id_a", "id_b", "__va", "__vb").mapInPandas(
        run, schema=out_schema
    )


def semantic_dedup(
    docs: DataFrame,
    vectors: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 8,
    centroids: list[list[float]] | None = None,
    max_cluster: int | None = None,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full SemDeDup decision: semantic pairs → connected components
    → one survivor (min id) per cluster; docs without an embedding are
    kept (no evidence against them). ``vectors[vec_id_col]`` must carry
    the same id domain as ``docs[id_col]``."""
    pairs = semantic_dedup_pairs(
        vectors, threshold, n_clusters, centroids, max_cluster,
        id_col=vec_id_col, vec_col=vec_col,
    )
    return dedup_keep_list(docs, pairs, id_col=id_col, a_col="id_a", b_col="id_b")
