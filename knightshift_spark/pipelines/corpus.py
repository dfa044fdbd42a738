"""Corpus curation pipeline — the LLM-training-data flagship composition.

Chains the scale operators end-to-end over a ``documents`` table:

1. exact dedup on the normalized-text fingerprint (md5 groupBy);
2. near-dup removal: MinHash+LSH candidates → exact Jaccard rescore →
   drop the higher doc_id of each confirmed pair (keep-first policy), or
   with ``transitive_closure=True`` the C4-style cluster form: connected
   components over confirmed pairs, one survivor (min id) per cluster;
3. quality gate: stopword ratio + token count thresholds, optionally
   plus the Gopher repetition screen (``repetition_thresholds``);
4. language filter against an allowlist (engine lang-ID, not the stored
   label — curation must not trust upstream metadata); optionally plus
   the CCNet-style LM quality gate (``lm_table`` + ``min_avg_logprob``,
   ``operators.lmscore`` — adds an ``lm_filtered`` funnel row);
   optionally plus the LEARNED linear quality gate (``quality_model``
   from ``operators.classifier`` — hard ``min_quality_score`` threshold
   or the deterministic Pareto keep-rule; survivors carry their
   ``quality_score``; adds a ``classifier_filtered`` funnel row);
5. optional benchmark decontamination (``eval_docs``): anti-join against
   the broadcast n-gram hit list (``operators.dedup.contaminated_ids``);
6. optional per-source quota (``quota``): deterministic cap on any one
   stratum (``operators.sampling.cap_per_group``);
7. optional deterministic mixture sampling (``mixture``): per-stratum
   md5-keyed fractions (``operators.sampling.stratified_sample``);
8. optional PII scrub of the surviving text (``pii_scrub=True``,
   ``operators.redact`` — a transform, not a filter: no funnel row);
0. (runs first) optional substring-level dedup
   (``strip_substrings={...}``, ``operators.substring`` — cut
   corpus-duplicated spans before any doc-level screen, the ExactSubstr
   ordering; also a transform, no funnel row).

The removal funnel reports one row per stage (input, exact-dup, near-dup,
quality/lang, contamination, quota, mixture, kept), each with a self-verifying
``ok`` bit (counts are non-negative — the funnel only shrinks), so even a
rows-only check pins the stage-monotonicity property.

Every stage is a DataFrame transform. With
``persist_intermediates=False`` the pipeline is ONE lazy plan until the
caller materializes; with ``True`` the multiply-referenced stage outputs
are checkpointed (materialize + lineage cut) at their boundary — the
standard production move between expensive curation stages. At 100 TB:
stage 1 is a single shuffle; stage 2 is the banded-LSH path (candidate
volume ∝ bucket occupancy); stages 3-5 are projections. The Jaccard
rescore only touches candidate pairs, never all pairs.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knightshift_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    stopword_ratio,
    token_count,
)
from knightshift_spark.operators.dedup import jaccard_pairs, lsh_candidate_pairs


class CurationResult(NamedTuple):
    kept: DataFrame  # surviving docs + engine-computed columns
    stats: DataFrame  # one row per removal reason
    # confirmed near-dup pairs (post-rescore): feed operators.dedup.
    # dedup_report BEFORE committing a destructive write, or audit what
    # the cluster dedup acted on; lazy — costs nothing unless used
    near_dup_pairs: DataFrame = None


def curate_corpus(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    min_tokens: int = 5,
    min_stopword_ratio: float = 0.0,
    langs: tuple[str, ...] = ("en",),
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_intermediates: bool = False,
    jaccard_df_max: int | None = 10_000,
    lsh_max_bucket: int | None = 10_000,
    eval_docs: DataFrame | None = None,
    contamination_ngram: int = 5,
    quota: int | None = None,
    mixture: dict[str, float] | None = None,
    mixture_col: str = "source",
    mixture_salt: str = "",
    transitive_closure: bool = False,
    repetition_thresholds: dict[str, float] | None = None,
    lm_table: DataFrame | None = None,
    min_avg_logprob: float | None = None,
    quality_model=None,
    min_quality_score: float | None = None,
    classifier_pareto_alpha: float = 9.0,
    pii_scrub: bool = False,
    strip_substrings: dict | None = None,
) -> CurationResult:
    # 0. (optional) substring-level dedup FIRST (the ExactSubstr move):
    # cut corpus-duplicated spans out of the text before any doc-level
    # screen, so fingerprints/shingles/quality see the cleaned text.
    # A transform, not a filter — no funnel row. kwargs pass through
    # (k/density/merge_gap), e.g. strip_substrings={"k": 40}
    if strip_substrings is not None:
        from knightshift_spark.operators.substring import strip_duplicated_spans

        docs = strip_duplicated_spans(
            docs, id_col=id_col, text_col=text_col, **strip_substrings
        )

    # bind the lowercased token array ONCE: each text function would
    # otherwise re-split per use (SCALE.md "Expression-engine lesson")
    from knightshift_spark.functions.text import tokens

    annotated = docs.select(
        "*", tokens(F.lower(F.col(text_col))).alias("__tk")
    ).select(
        *docs.columns,
        doc_fingerprint(F.col(text_col)).alias("__fp"),
        token_count(F.col(text_col), tk=F.col("__tk")).alias("n_tokens"),
        stopword_ratio(F.col(text_col), tk=F.col("__tk")).alias("sw_ratio"),
        lang_id(F.col(text_col), tk=F.col("__tk")).alias("lang_pred"),
    )

    # 1. exact dedup: keep the lowest id per fingerprint
    first = annotated.groupBy("__fp").agg(F.min(id_col).alias("__keep"))
    exact_kept = annotated.join(
        first, (annotated["__fp"] == first["__fp"]) & (annotated[id_col] == first["__keep"]),
        "left_semi",
    )
    if persist_intermediates:
        # the dedup subtree feeds both the kept output and three funnel
        # counters. localCheckpoint (materialize + TRUNCATE lineage), not
        # plain persist: the funnel's counters all reference this subtree,
        # and with lazy persist the parallel branches of the one stats
        # action race cache population and recompute it per branch; worse,
        # every re-execution re-analyzes/re-optimizes the full LSH lineage
        # (measured ~3.5s/run of pure planning at sf0.1). Checkpointing
        # caps the plan at an RDD scan. Executor-local storage is the
        # documented local-mode tradeoff; on a cluster use
        # ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
        # fault-tolerant lineage cuts.
        exact_kept = exact_kept.localCheckpoint()

    # 2. near-dup: LSH candidates → exact rescore → drop doc_b of each pair.
    # jaccard_df_max caps shingle doc-frequency in the rescore: even among
    # LSH candidates, one degenerate common shingle could otherwise blow
    # the equi-join up to O(candidates²) rows.
    # lsh_max_bucket caps band-bucket occupancy (star pairing above it) —
    # a duplicate-heavy corpus otherwise pays quadratic pair expansion
    # inside its dominant cluster's bucket
    cands = lsh_candidate_pairs(
        exact_kept,
        num_hashes=16,
        bands=4,
        id_col=id_col,
        text_col=text_col,
        max_bucket=lsh_max_bucket,
    )
    confirmed = (
        jaccard_pairs(
            exact_kept.join(
                cands.select(F.explode(F.array("doc_a", "doc_b")).alias(id_col)).distinct(),
                id_col,
                "left_semi",
            ),
            threshold=jaccard_threshold,
            id_col=id_col,
            text_col=text_col,
            df_max=jaccard_df_max,
        )
        .join(cands, ["doc_a", "doc_b"], "left_semi")  # rescore candidates only
    )
    if transitive_closure:
        # C4/RefinedWeb-style CLUSTER dedup: confirmed pairs → connected
        # components → keep the min id per cluster. Strictly stronger than
        # pair-local removal: with pairs (A,B) and (C,B), dropping only
        # doc_b keeps C although it chains to A through B. Costs an
        # iterative fixpoint (driver-looped actions), so it is opt-in —
        # the default stays one lazy plan.
        from knightshift_spark.operators.dedup import connected_components

        comps = connected_components(confirmed)
        near_dup_ids = comps.filter(F.col("id") != F.col("comp")).select(
            F.col("id").alias(id_col)
        )
    else:
        near_dup_ids = confirmed.select(F.col("doc_b").alias(id_col)).distinct()
    deduped = exact_kept.join(near_dup_ids, id_col, "left_anti")
    if persist_intermediates:
        # deduped feeds `kept` AND two funnel counters; checkpoint cuts
        # the LSH+rescore lineage (see exact_kept note)
        deduped = deduped.localCheckpoint()

    # 3-4. quality + language gates (optionally + the Gopher repetition
    # screen — published character-mass thresholds, operators.quality)
    quality_ok = (F.col("n_tokens") >= min_tokens) & (F.col("sw_ratio") >= min_stopword_ratio)
    lang_ok = F.col("lang_pred").isin(*langs)
    kept = deduped.filter(quality_ok & lang_ok).drop("__fp")
    if repetition_thresholds is not None:
        from knightshift_spark.operators.quality import gopher_repetition_filter

        if persist_intermediates:
            # the screen references `kept` once per stats family plus the
            # final semi-join — checkpoint so each reference is an RDD
            # scan, not a copy of the whole dedup funnel lineage
            kept = kept.localCheckpoint()
        kept = gopher_repetition_filter(
            kept, thresholds=repetition_thresholds, id_col=id_col, text_col=text_col
        )

    gated = kept

    # 4b. (optional) CCNet-style LM quality gate: drop docs whose mean
    # token log-prob under the reference unigram model falls below the
    # threshold (operators.lmscore — vocab-sized broadcast model). Adds
    # an `lm_filtered` funnel row only when active.
    if lm_table is not None and min_avg_logprob is not None:
        from knightshift_spark.operators.lmscore import lm_quality_score

        scores = lm_quality_score(gated, lm_table, id_col=id_col, text_col=text_col)
        good = scores.filter(F.col("avg_logprob") >= F.lit(min_avg_logprob)).select(id_col)
        kept = gated.join(good, id_col, "left_semi")
        if persist_intermediates:
            kept = kept.localCheckpoint()
    lm_gated = kept

    # 4c. (optional) LEARNED quality gate: the GPT-3/CCNet linear
    # classifier (operators.classifier). ``min_quality_score`` keeps by
    # hard threshold; otherwise the deterministic Pareto keep-rule with
    # ``classifier_pareto_alpha`` decides, so low scorers survive with
    # the published long-tail probability. Scoring is a shuffle-free map;
    # survivors carry their `quality_score`. Adds a `classifier_filtered`
    # funnel row only when a model is supplied.
    if quality_model is not None:
        from knightshift_spark.operators.classifier import (
            pareto_quality_filter,
            score_docs,
        )

        if min_quality_score is not None:
            scored = score_docs(quality_model, lm_gated, text_col=text_col)
            kept = scored.filter(
                F.col("quality_score") >= F.lit(min_quality_score)
            )
        else:
            kept = pareto_quality_filter(
                quality_model,
                lm_gated,
                id_col=id_col,
                text_col=text_col,
                alpha=classifier_pareto_alpha,
                salt=mixture_salt,
            )
        if persist_intermediates:
            kept = kept.localCheckpoint()
    clf_gated = kept

    # 5. (optional) benchmark decontamination: drop any doc sharing an
    # n-gram with the eval set — anti-join against the broadcast hit list
    if eval_docs is not None:
        from knightshift_spark.operators.dedup import contaminated_ids

        hits = contaminated_ids(
            clf_gated, eval_docs, n=contamination_ngram, id_col=id_col, text_col=text_col
        )
        kept = clf_gated.join(hits, id_col, "left_anti")
        # NOT checkpointed even under persist_intermediates: the gram
        # explode here reads the already-checkpointed dedup output, so
        # its lineage is shallow — re-running it per funnel consumer
        # costs ~0.45 s at sf0.1 while the checkpoint job it replaces
        # costs ~1.4 s (A/B measured round 8; the heavy subtrees above
        # are a different story — dropping exact_kept's checkpoint
        # TRIPLES the LSH plan and loses 1.4 s)
    decontaminated = kept

    # 6. (optional) per-source quota: cap any one stratum from dominating
    # (deterministic md5-ranked selection — operators.sampling.cap_per_group)
    if quota is not None:
        from knightshift_spark.operators.sampling import cap_per_group

        kept = cap_per_group(
            kept, quota, group_col=mixture_col, key_col=id_col, salt=mixture_salt
        )
    quota_capped = kept

    # 7. (optional) deterministic mixture sampling per stratum
    if mixture is not None:
        from knightshift_spark.operators.sampling import stratified_sample

        kept = stratified_sample(
            kept, mixture, strata_col=mixture_col, key_col=id_col, salt=mixture_salt
        )

    # stats stay LAZY: one action materializes the whole funnel. Eager
    # .count() per stage would re-run the expensive dedup subtree once per
    # counter before the caller even asks. Every stage count rides along
    # with a self-verifying ok bit (removals are non-negative — the funnel
    # can only shrink), so a rows-only driver check still pins the
    # monotonicity property.
    def _n(df: DataFrame, alias: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias(alias))

    stages = [
        ("exact_dup_removed", exact_kept),
        ("near_dup_removed", deduped),
        ("quality_or_lang_removed", gated),
    ]
    if lm_gated is not gated:
        stages.append(("lm_filtered", lm_gated))
    if clf_gated is not lm_gated:
        stages.append(("classifier_filtered", clf_gated))
    stages += [
        ("contaminated_removed", decontaminated),
        ("quota_removed", quota_capped),
        ("mixture_removed", kept),
    ]
    # flat funnel plan (VERDICT r6 nit): one UNION of the per-stage
    # 1-row counts + a lag window over the N+1 rows, instead of N
    # chained 1-row crossJoins — same single action, flatter plan
    from pyspark.sql.window import Window

    counts = _n(docs, "n").select(
        F.lit(-1).alias("__i"), F.lit("input").alias("__reason"), F.col("n")
    )
    for i, (reason, df) in enumerate(stages):
        counts = counts.unionByName(
            _n(df, "n").select(
                F.lit(i).alias("__i"), F.lit(reason).alias("__reason"), F.col("n")
            )
        )
    # N+1 rows total — the unpartitioned window is a deliberate
    # single-partition pass over a constant-size relation
    lagged = counts.withColumn("__prev", F.lag("n").over(Window.orderBy("__i")))
    input_row = lagged.filter(F.col("__i") == -1).select(
        F.col("__reason").alias("reason"), F.col("n")
    )
    removed = lagged.filter(F.col("__i") >= 0).select(
        F.col("__reason").alias("reason"), (F.col("__prev") - F.col("n")).alias("n")
    )
    kept_row = lagged.filter(F.col("__i") == len(stages) - 1).select(
        F.lit("kept").alias("reason"), F.col("n")
    )
    stats = (
        input_row.unionByName(removed)
        .unionByName(kept_row)
        .select("reason", "n", (F.col("n") >= 0).alias("ok"))
    )

    # (optional) final PII scrub — a transform, not a filter: the kept
    # set is unchanged, its text loses identifiers (operators.redact)
    if pii_scrub:
        from knightshift_spark.operators.redact import redact_pii

        kept = redact_pii(kept, text_col=text_col)
    return CurationResult(kept=kept, stats=stats, near_dup_pairs=confirmed)
