"""Cross-relation fuzzy (similarity) join — entity matching at scale.

Joining two tables on NEARLY-equal text (crawl pages vs a curated list,
two partner catalogs, citation matching) is the two-relation twin of
near-dup detection. The reference's enrichment stage joins on exact ids
(`backfill_user_profiles.py`); this operator is the fuzzy
generalization: (left, right, jaccard) pairs with word-shingle Jaccard
at or above a threshold.

Scale shape (same playbook as ``operators.dedup``, applied across two
relations):

1. both sides compute the SAME MinHash band buckets
   (``lsh_band_buckets`` — one wide-aggregation shuffle per side; the
   hash family is deterministic, so equal text hashes identically on
   both sides);
2. candidates = band-bucket equi-join LEFT×RIGHT, never all-pairs.
   Bucket occupancy is capped PER SIDE: a bucket where either side
   exceeds ``max_bucket`` is skipped in that band (boilerplate buckets
   would otherwise expand |L|×|R|); a true match loses only that band
   and still surfaces through its other bands — the standard
   banding-recall trade, stated;
3. exact Jaccard rescore of candidates only: shingle tables restricted
   to candidate ids, collected to one capped set per doc; the candidate
   pairs drive an id-keyed join and a per-row ``array_intersect`` — the
   LSH estimate never reaches the output.

``fuzzy_join_exact`` is the small-scope baseline (every shared-shingle
pair, no banding) used by tests and honest-recall measurements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knightshift_spark.operators.dedup import lsh_band_buckets, shingle_table
from knightshift_spark.plans.partitioning import lint_checkpoint

# corpus-size threshold above which _rescore cuts its shingle tables'
# lineage (see the size-gated checkpoint note in _rescore)
_RESCORE_CKPT_MIN_BYTES = 256 << 20


def _rescore(
    left: DataFrame,
    right: DataFrame,
    cands: DataFrame,
    threshold: float,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    df_max: int | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard for the candidate pairs only.

    ``df_max`` caps a shingle's document frequency across BOTH sides
    (the ``jaccard_pairs`` cap, cross-relation): the bucket cap bounds
    candidate PAIRS, but one boilerplate shingle shared by thousands of
    candidate docs would still fan the rescore join out |L|×|R| on that
    shingle. Capped shingles leave the intersection AND both size
    denominators, so the Jaccard stays consistent over the capped
    shingle universe."""
    lsub = left.join(
        cands.select(F.col("left_id").alias(left_id)).distinct(), left_id, "left_semi"
    )
    rsub = right.join(
        cands.select(F.col("right_id").alias(right_id)).distinct(),
        right_id,
        "left_semi",
    )
    # size-gated checkpoint (r13): each shingle table is consumed by up
    # to TWO subtrees below (the df_max rarity count and its side's
    # per-doc set collection), and every reference re-runs the
    # candidate semi-join — which re-SCANS its corpus side.
    # Cheap on a small corpus (the recompute beats two eager
    # checkpoint jobs — measured at sf0.1: +0.7 s charged if always
    # on), corpus-proportional waste at scale — so cut the lineage only
    # when the input relations are big or their size is unknowable (the
    # heavy-hitters adaptive-gate rule: unknown → the scale-safe plan).
    # The checkpointed rows are bounded either way: ∝ the CANDIDATE
    # docs' shingles, both sides already semi-joined to the capped LSH
    # pair set.
    from knightshift_spark.plans.partitioning import plan_size_bytes

    est_l, est_r = plan_size_bytes(left), plan_size_bytes(right)
    big = (
        est_l is None
        or est_r is None
        or est_l + est_r > _RESCORE_CKPT_MIN_BYTES
    )
    lsh_t = shingle_table(lsub, left_id, left_text).select(
        F.col(left_id).alias("left_id"), "shingle"
    )
    rsh_t = shingle_table(rsub, right_id, right_text).select(
        F.col(right_id).alias("right_id"), "shingle"
    )
    if big:
        lsh_t = lint_checkpoint(lsh_t, "fuzzy_join.left_shingles")
        rsh_t = lint_checkpoint(rsh_t, "fuzzy_join.right_shingles")
    if df_max is not None:
        rare = (
            lsh_t.select("shingle")
            .unionAll(rsh_t.select("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= df_max)
            .select("shingle")
        )
        lsh_t = lsh_t.join(rare, "shingle", "left_semi")
        rsh_t = rsh_t.join(rare, "shingle", "left_semi")
    # r14: pair-driven intersection (the jaccard_rescore_pairs shape,
    # cross-relation — see operators/dedup.py): the candidate pairs
    # drive an id-keyed join against each side's collected shingle set
    # and the intersection is a per-row array_intersect. The old
    # shingle-keyed join paired ANY colliding docs among the candidate
    # ids (Σ_sh df_l(sh)·df_r(sh) fan-out rows through a pair-keyed
    # aggregation) before the cands semi-join kept the actual pairs.
    # Output identical: same |L∩R| / (|L|+|R|−|L∩R|) over the df-capped
    # shingle universe, same round-then-threshold, and the explicit
    # ``inter >= 1`` filter reproduces the old inner shingle join's
    # ≥1-shared-shingle requirement exactly (even at threshold 0).
    lsets = lsh_t.groupBy("left_id").agg(F.collect_list("shingle").alias("__sha"))
    rsets = rsh_t.groupBy("right_id").agg(F.collect_list("shingle").alias("__shb"))
    inter = F.size(F.array_intersect("__sha", "__shb"))
    jac = inter / (F.size("__sha") + F.size("__shb") - inter)
    return (
        cands.join(lsets, "left_id")
        .join(rsets, "right_id")
        .filter(inter >= 1)
        .select("left_id", "right_id", F.round(jac, 4).alias("jaccard"))
        .filter(F.round(jac, 4) >= threshold)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    left_id: str = "doc_id",
    right_id: str = "doc_id",
    left_text: str = "text",
    right_text: str = "text",
    max_bucket: int | None = 10_000,
    df_max: int | None = 10_000,
) -> DataFrame:
    """(left_id, right_id, jaccard) for cross-relation pairs with exact
    shingle Jaccard ≥ ``threshold``, candidates generated by shared
    MinHash band buckets. Output ids keep the ``left_id``/``right_id``
    column names so self-joins stay unambiguous. ``df_max`` caps the
    rescore's per-shingle fan-out (see ``_rescore``)."""
    lb = lsh_band_buckets(left, num_hashes, bands, left_id, left_text).select(
        F.col(left_id).alias("left_id"), "band", "bucket"
    )
    rb = lsh_band_buckets(right, num_hashes, bands, right_id, right_text).select(
        F.col(right_id).alias("right_id"), "band", "bucket"
    )
    if max_bucket is not None:
        if max_bucket < 1:
            raise ValueError(f"max_bucket must be >= 1, got {max_bucket}")
        # per-side occupancy window + filter ≡ the old both-sides-ok
        # semi-join: a pair survives iff BOTH its bucket sides are at
        # or under the cap, and filtering each side by its own count
        # drops exactly the same join rows (a bucket over cap on either
        # side contributes nothing to the join either way). One window
        # per side replaces two count-aggregate subtrees + the ok join
        # + two semi-joins, and the window's (band, bucket) exchange is
        # the very partitioning the candidate join needs — Catalyst
        # reuses it instead of shuffling a third time (the same
        # annotate_bucket_occupancy idiom as the capped LSH paths,
        # applied cross-relation; plan-linted there). Tradeoff, explicit:
        # an over-cap mega-bucket is exchanged and sorted by ONE window
        # task before its filter drops it, where the old aggregate
        # combined it map-side — the skew bench (duplicate-heavy corpus,
        # hot buckets) measures this shape and it holds; a corpus whose
        # single bucket approaches executor memory should cap via the
        # aggregate form instead.
        from knightshift_spark.operators.dedup import annotate_bucket_occupancy

        lb = (
            annotate_bucket_occupancy(lb, ["band", "bucket"], "left_id")
            .filter(F.col("__n") <= max_bucket)
            .drop("__n", "__rep")
        )
        rb = (
            annotate_bucket_occupancy(rb, ["band", "bucket"], "right_id")
            .filter(F.col("__n") <= max_bucket)
            .drop("__n", "__rep")
        )
    cands = lint_checkpoint(
        lb.join(rb, ["band", "bucket"]).select("left_id", "right_id").distinct(),
        # _rescore references the pair set three times (two id semi-joins
        # + the pair confirm); without the cut each reference re-runs the
        # full two-sided banding (measured 3.9s -> 1.6s at the q69 scope).
        # The relation is bounded by the bucket caps — id pairs only.
        "fuzzy_join.candidates",
    )
    return _rescore(
        left, right, cands, threshold, left_id, right_id, left_text,
        right_text, df_max=df_max,
    )


def fuzzy_join_exact(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.5,
    left_id: str = "doc_id",
    right_id: str = "doc_id",
    left_text: str = "text",
    right_text: str = "text",
) -> DataFrame:
    """Baseline without banding: every pair sharing ≥1 shingle is scored
    (the shingle equi-join still avoids a cartesian, but a common
    shingle fans out — small-scope/oracle use only)."""
    lsh_t = shingle_table(left, left_id, left_text).select(
        F.col(left_id).alias("left_id"), "shingle"
    )
    rsh_t = shingle_table(right, right_id, right_text).select(
        F.col(right_id).alias("right_id"), "shingle"
    )
    cands = lsh_t.join(rsh_t, "shingle").select("left_id", "right_id").distinct()
    return _rescore(
        left, right, cands, threshold, left_id, right_id, left_text, right_text
    )
