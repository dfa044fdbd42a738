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

Every stage is a DataFrame transform. With the DEFAULT
``persist_intermediates=True`` the pipeline runs as ONE materializing
action (the final ``localCheckpoint`` — lineage cut + kept set in
hand), and every stage counter rides that action as an ``observe()``
accumulator (VERDICT r8 #1): counts are JVM-side accumulators on the
one executing plan, zero extra jobs, zero re-planned count branches,
and ``stats`` comes back as a literal DataFrame.

``persist_intermediates=False`` is the fully-lazy opt-in: no job runs
until the caller materializes, and the funnel is a lazy
union-of-counts plan. Use it only for SHORT funnels: a pure logical
TREE cannot share the fork subtrees, so each optional forked stage
(repetition screen, LM gate, decontamination) roughly doubles the plan
and the 8 funnel count branches re-embed every prefix — Catalyst
analysis/optimization grows exponentially in forked-stage count
(measured: 73 s of pure planning for a 2-doc corpus with the
repetition screen on; the default path runs the same semantics in 2-3
bounded jobs). This is a property of lazy tree plans, not of the data.

Exactness of the observed counts relies on the CARRIER invariant: the
pipeline threads two chains. ``car`` (the carrier) holds every observe
node and is consumed exactly once, by the final action; ``raw`` is its
unobserved twin, and every fork — a side subtree that re-reads a stage
output (the min-id-per-fingerprint aggregate, the LSH+rescore
candidate machinery, LM scores, repetition stats, contamination hits)
— is built from ``raw``, then joined into BOTH chains as the same
plan object. An observe node that appeared under two consumers would
double-fire its accumulator; the carrier never forks, so each fires
once. The duplicated raw segments cost little at runtime: the mirrored
join/aggregate exchanges are canonically identical, so Catalyst's
ReuseExchange executes them once, and the side subtrees themselves are
referenced once each. At 100 TB: stage 1 is a single shuffle; stage 2
is the banded-LSH path (candidate volume ∝ bucket occupancy); stages
3-5 are projections. The Jaccard rescore only touches candidate pairs,
never all pairs.
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
from knightshift_spark.operators.dedup import (
    jaccard_rescore_pairs,
    lsh_candidate_pairs,
)


# r14: the scoped bounded-job confs moved to plans.partitioning
# (tiny_job_confs) so the q59 recall harness can declare the same
# bounded-input execution shape; this alias keeps the funnel's
# call sites and their history readable.
from knightshift_spark.plans.partitioning import tiny_job_confs as _tiny_job_confs


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
    persist_intermediates: bool = True,
    jaccard_df_max: int | None = 10_000,
    lsh_max_bucket: int | None = 10_000,
    rescore_max_shingles: int | None = 250_000,
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
    normalize: dict | None = None,
    small_input: bool = False,
) -> CurationResult:
    """See the module docstring for the stage map.

    ``small_input=True`` declares the input BOUNDED (a demo slice, a
    per-partition backfill, an incremental batch — thousands of docs,
    not a corpus): the tiny id relations the near-dup stage produces
    (candidate ids, near-dup ids) are hinted ``broadcast`` so their
    joins skip shuffles, and the funnel's one eager job runs under
    ``_tiny_job_confs``. At corpus scale leave it False — those id
    sets are only bounded by the duplicate rate, and broadcasting them
    would be wrong.

    ``rescore_max_shingles`` (r15, VERDICT r14 #6) is the near-dup
    rescore's payload guard: the pair-driven rescore ships each doc's
    shingle array once per candidate pair, so one pathological hub
    document (≈250k+ distinct bigrams ⇒ a 250k+-token doc, far past
    any sane pretraining document after upstream chunking) could make
    array payload the dominant shuffle bytes at 100 TB. Over-limit
    docs RAISE with their id — the guard never truncates, so funnel
    output is byte-identical for every conforming corpus. ``None``
    disables it."""
    # 0a. (optional) unicode normalization FIRST of all — every later
    # stage keys on exact bytes (fingerprints, shingle hashes, gram
    # joins), so normalization-form variants of the same text must fold
    # before any hashing. A transform, not a filter — no funnel row.
    # kwargs pass through (form/collapse_spaces), e.g.
    # normalize={"form": "NFKC"}; form=None keeps it pure-codegen.
    if normalize is not None:
        from knightshift_spark.operators.textnorm import normalize_text

        docs = normalize_text(docs, text_col=text_col, **normalize)

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

    # Funnel counters, observe mode (persist_intermediates=True): each
    # stage count is a JVM-side accumulator riding the ONE plan the
    # final action executes — no per-counter re-plan/re-run, no
    # intermediate checkpoint jobs. The carrier invariant (module
    # docstring): ``car`` carries every observe node and is consumed
    # exactly once; every fork subtree reads ``raw``, the unobserved
    # twin. ``pending`` holds stage names whose count equals the
    # CURRENT carrier, attached by ``_drain`` before the next carrier
    # transform (inactive optional stages stack — equal counts — and
    # read as 0-removed rows, same as the lazy funnel).
    use_obs = persist_intermediates
    obsmap: dict[str, object] = {}
    obs_order: list[str] = []
    pending: list[str] = []
    # observations are NAMED (unique per run) so the failure path of
    # _count_of can check the EXECUTED plan for the matching
    # CollectMetrics node instead of pattern-matching exception text
    # (ADVICE r9)
    import uuid as _uuid

    run_tag = _uuid.uuid4().hex[:8]

    def _obs_name(name: str) -> str:
        return f"funnel_{run_tag}_{name}"

    def _drain(df: DataFrame) -> DataFrame:
        if use_obs:
            from pyspark.sql import Observation

            for name in pending:
                o = Observation(_obs_name(name))
                obsmap[name] = o
                obs_order.append(name)
                df = df.observe(o, F.count(F.lit(1)).alias("n"))
        pending.clear()
        return df

    raw = annotated  # unobserved twin: every fork subtree reads this
    car = annotated  # carrier: observed, consumed once by the final action
    pending.append("input")

    # 1. exact dedup: keep the lowest id per fingerprint. `first` is a
    # fork (it re-reads the annotated input), so it is built from `raw`
    # and the SAME plan object joins into both chains — Catalyst's
    # ReuseExchange executes its aggregate once.
    first = raw.groupBy("__fp").agg(F.min(id_col).alias("__keep")).select(
        F.col("__fp").alias("__fp_k"), "__keep"
    )

    def _exact(df: DataFrame) -> DataFrame:
        return df.join(
            first,
            (df["__fp"] == first["__fp_k"]) & (df[id_col] == first["__keep"]),
            "left_semi",
        )

    raw = _exact(raw)
    car = _exact(_drain(car)) if use_obs else raw
    pending.append("exact_dup_removed")
    if use_obs:
        # the ONE intermediate checkpoint kept: every downstream subtree
        # — carrier and fork alike — re-reads the exact-dedup output,
        # and without a lineage cut here each reference re-executes the
        # tokenize/fingerprint/lang-id base projection over the full
        # input (A/B at the q57 demo scope: the fully-fused plan re-runs
        # the base ~8× and the one action takes 2.9 s vs ~1.3 s with the
        # cut). localCheckpoint, not persist: parallel branches of one
        # action race lazy cache population. After the checkpoint the
        # two chains MERGE — upstream observes are frozen in the
        # materialized RDD, so the node is fork-safe and raw == car.
        # Executor-local storage is the documented local-mode tradeoff;
        # on a cluster use ``sparkContext.setCheckpointDir`` +
        # ``.checkpoint()`` for fault-tolerant cuts.
        with _tiny_job_confs(docs.sparkSession, small_input):
            car = _drain(car).localCheckpoint()
        raw = car
    exact_kept = car

    # 2. near-dup: LSH candidates → exact rescore → drop doc_b of each pair.
    # jaccard_df_max caps shingle doc-frequency in the rescore: even among
    # LSH candidates, one degenerate common shingle could otherwise blow
    # the equi-join up to O(candidates²) rows.
    # lsh_max_bucket caps band-bucket occupancy (star pairing above it) —
    # a duplicate-heavy corpus otherwise pays quadratic pair expansion
    # inside its dominant cluster's bucket
    def _tiny(df: DataFrame) -> DataFrame:
        # candidate/near-dup ID relations are broadcast-safe ONLY when
        # the caller declared a bounded input; at corpus scale their
        # size is bounded by nothing but the duplicate rate
        return F.broadcast(df) if small_input else df

    cands = lsh_candidate_pairs(
        raw,
        num_hashes=16,
        bands=4,
        id_col=id_col,
        text_col=text_col,
        max_bucket=lsh_max_bucket,
    )
    # r14: pair-driven rescore (jaccard_rescore_pairs) — the LSH pairs
    # drive an array_intersect join instead of scoring every co-shingled
    # pair and semi-joining down (at this scope the old shape computed
    # 835k pairs to keep 39.7k; A/B: 2.28 s/10.3 CPU-s → 1.65 s/5.6
    # CPU-s, output set-equal). Under small_input the per-doc shingle
    # sets broadcast like every other bounded id relation here.
    confirmed = jaccard_rescore_pairs(
        cands,
        raw.join(
            _tiny(
                cands.select(
                    F.explode(F.array("doc_a", "doc_b")).alias(id_col)
                ).distinct()
            ),
            id_col,
            "left_semi",
        ),
        threshold=jaccard_threshold,
        id_col=id_col,
        text_col=text_col,
        df_max=jaccard_df_max,
        broadcast_sets=small_input,
        max_set_size=rescore_max_shingles,
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
    raw = raw.join(_tiny(near_dup_ids), id_col, "left_anti")
    car = _drain(car).join(_tiny(near_dup_ids), id_col, "left_anti") if use_obs else raw
    deduped = car
    pending.append("near_dup_removed")
    # the raw chain now embeds the whole LSH+rescore machinery. A fork
    # built from it later (repetition stats, LM scores, contamination
    # grams) would replicate that lineage into its subtree — runtime
    # exchange reuse dedupes the heavy shuffles, but Catalyst re-analyzes
    # and re-optimizes each copy (measured seconds of pure planning per
    # action at sf0.1). `raw_dirty` arms a ONE-TIME lineage cut that
    # fires lazily, just before the first such fork — a pipeline with a
    # linear tail (no optional fork stage active) never pays it.
    raw_dirty = True

    def _cut(car: DataFrame, raw: DataFrame, dirty: bool):
        if use_obs and dirty:
            with _tiny_job_confs(docs.sparkSession, small_input):
                car = _drain(car).localCheckpoint()
            raw = car  # chains merge: upstream observes are frozen
        return car, raw, False

    # 3-4. quality + language gates (optionally + the Gopher repetition
    # screen — published character-mass thresholds, operators.quality).
    # Pure column predicates: carrier-safe, applied to both chains.
    quality_ok = (F.col("n_tokens") >= min_tokens) & (F.col("sw_ratio") >= min_stopword_ratio)
    lang_ok = F.col("lang_pred").isin(*langs)
    raw = raw.filter(quality_ok & lang_ok).drop("__fp")
    car = _drain(car).filter(quality_ok & lang_ok).drop("__fp") if use_obs else raw
    if repetition_thresholds is not None:
        from knightshift_spark.operators.quality import gopher_repetition_filter

        # the screen's stats families re-read their input — a fork, so
        # the surviving-ID list is computed from `raw` and semi-joined
        # into both chains
        car, raw, raw_dirty = _cut(car, raw, raw_dirty)
        rep_ids = gopher_repetition_filter(
            raw, thresholds=repetition_thresholds, id_col=id_col, text_col=text_col
        ).select(id_col)
        raw = raw.join(rep_ids, id_col, "left_semi")
        car = car.join(rep_ids, id_col, "left_semi") if use_obs else raw

    gated = car
    pending.append("quality_or_lang_removed")

    # 4b. (optional) CCNet-style LM quality gate: drop docs whose mean
    # token log-prob under the reference unigram model falls below the
    # threshold (operators.lmscore — vocab-sized broadcast model). Adds
    # an `lm_filtered` funnel row only when active.
    if lm_table is not None and min_avg_logprob is not None:
        from knightshift_spark.operators.lmscore import lm_quality_score

        # the score aggregate re-reads its input — a fork, built from raw
        car, raw, raw_dirty = _cut(car, raw, raw_dirty)
        scores = lm_quality_score(raw, lm_table, id_col=id_col, text_col=text_col)
        good = scores.filter(F.col("avg_logprob") >= F.lit(min_avg_logprob)).select(id_col)
        raw = raw.join(good, id_col, "left_semi")
        car = _drain(car).join(good, id_col, "left_semi") if use_obs else raw
        pending.append("lm_filtered")
    lm_gated = car

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

        # both classifier paths are LINEAR (featurize → score → filter:
        # pure projections, no self-reference), so they apply to each
        # chain directly — no fork, carrier-safe
        def _clf(df: DataFrame) -> DataFrame:
            if min_quality_score is not None:
                return score_docs(quality_model, df, text_col=text_col).filter(
                    F.col("quality_score") >= F.lit(min_quality_score)
                )
            return pareto_quality_filter(
                quality_model,
                df,
                id_col=id_col,
                text_col=text_col,
                alpha=classifier_pareto_alpha,
                salt=mixture_salt,
            )

        raw = _clf(raw)
        car = _clf(_drain(car)) if use_obs else raw
        pending.append("classifier_filtered")
    clf_gated = car

    # 5. (optional) benchmark decontamination: drop any doc sharing an
    # n-gram with the eval set — anti-join against the broadcast hit list
    if eval_docs is not None:
        from knightshift_spark.operators.dedup import contaminated_ids

        # the gram explode re-reads its input — a fork, built from raw
        car, raw, raw_dirty = _cut(car, raw, raw_dirty)
        hits = contaminated_ids(
            raw, eval_docs, n=contamination_ngram, id_col=id_col, text_col=text_col
        )
        raw = raw.join(hits, id_col, "left_anti")
        car = _drain(car).join(hits, id_col, "left_anti") if use_obs else raw
    decontaminated = car
    pending.append("contaminated_removed")

    # 6. (optional) per-source quota: cap any one stratum from dominating
    # (deterministic md5-ranked selection — operators.sampling.cap_per_group).
    # A window + filter: linear, carrier-safe.
    if quota is not None:
        from knightshift_spark.operators.sampling import cap_per_group

        raw = cap_per_group(
            raw, quota, group_col=mixture_col, key_col=id_col, salt=mixture_salt
        )
        car = (
            cap_per_group(
                _drain(car), quota,
                group_col=mixture_col, key_col=id_col, salt=mixture_salt,
            )
            if use_obs
            else raw
        )
    quota_capped = car
    pending.append("quota_removed")

    # 7. (optional) deterministic mixture sampling per stratum
    # (broadcast-join + filter: linear, carrier-safe)
    if mixture is not None:
        from knightshift_spark.operators.sampling import stratified_sample

        raw = stratified_sample(
            raw, mixture, strata_col=mixture_col, key_col=id_col, salt=mixture_salt
        )
        car = (
            stratified_sample(
                _drain(car), mixture,
                strata_col=mixture_col, key_col=id_col, salt=mixture_salt,
            )
            if use_obs
            else raw
        )
    pending.append("mixture_removed")
    kept = car

    if use_obs:
        # materialize ONCE: this localCheckpoint is the single action of
        # the whole pipeline — it fires every stage accumulator (zero
        # extra jobs, zero re-planned count branches, VERDICT r8 #1) and
        # hands the caller a lineage-cut, materialized kept set, which
        # is what persist_intermediates promised all along
        final_car = _drain(kept)
        with _tiny_job_confs(docs.sparkSession, small_input):
            kept = final_car.localCheckpoint()

        # the plan the action ACTUALLY executed (same QueryExecution the
        # checkpoint consumed; with AQE this is the final adaptive plan)
        try:
            executed_plan = (
                final_car._jdf.queryExecution().executedPlan().toString()
            )
        except Exception:
            executed_plan = None  # introspection unavailable: stay loud

        def _count_of(name: str, o) -> int:
            try:
                return int(o.get["n"])
            except Exception:
                # a CollectMetrics node inside a provably-EMPTY subtree
                # is removed by the empty-relation propagation rules
                # (classic PropagateEmptyRelation and its AQE twin), so
                # its observation never fires. Emptiness is the only
                # condition under which Spark drops an observe node, so
                # the true count at that chain point is 0 — but verify
                # it against the EXECUTED plan (the node named
                # funnel_<run>_<stage> must be absent) instead of
                # matching exception text: a generic JVM assertion from
                # an unrelated failure must stay loud, never fabricate
                # a 0 with ok=True (ADVICE r9).
                if executed_plan is not None and _obs_name(name) not in executed_plan:
                    return 0
                raise

        counts = {name: _count_of(name, o) for name, o in obsmap.items()}
        vals = [(name, counts[name]) for name in obs_order]
        rows, prev = [], None
        for name, n in vals:
            if name == "input":
                rows.append(("input", n, n >= 0))
            else:
                rows.append((name, prev - n, prev - n >= 0))
            prev = n
        rows.append(("kept", prev, prev >= 0))
        # JVM LocalTableScan, not a Python-RDD relation: the stats frame
        # is re-executed by every downstream action (plans.localrel)
        from knightshift_spark.plans.localrel import local_relation

        stats = local_relation(
            docs.sparkSession, rows, "reason string, n bigint, ok boolean"
        )
    else:
        # stats stay LAZY: one action materializes the whole funnel. Eager
        # .count() per stage would re-run the expensive dedup subtree once
        # per counter before the caller even asks. Every stage count rides
        # with a self-verifying ok bit (removals are non-negative — the
        # funnel can only shrink), so a rows-only driver check still pins
        # the monotonicity property.
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
