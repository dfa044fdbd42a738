"""Incremental corpus ingestion: the curation screens as a stream.

A training corpus is not built in one batch — documents arrive
continuously (crawl output, partner drops) and must be screened and
deduplicated INCREMENTALLY without reprocessing the accumulated corpus.
This module runs the batch curation pieces under Structured Streaming:

- source: a spool directory of JSON-lines document files (one doc per
  line: ``{"doc_id": ..., "text": ..., "source": ...}``);
- per-batch screens: token-count/language quality gates plus a
  row-local duplicate-bigram repetition cap — pure projections sharing
  the batch funnel's expression code (the aggregation-based Gopher
  character-mass family belongs to the scheduled batch pass);
- cross-batch exact dedup: ``dropDuplicates`` on the normalized-text
  fingerprint with the fingerprint kept in the state store, so a doc
  seen in ANY earlier micro-batch is dropped, not just within-batch.
  State is fingerprint-keyed (one shuffle) and grows with the distinct
  corpus; at 100 TB bound it with a watermark on ingest time
  (``dedup_within_watermark``) or periodic compaction to the batch path;
- sink: append-only parquet (dedup happened upstream, so append is
  safe to replay — a replayed batch's rows are all state-store hits).

Near-dup (LSH) dedup stays BATCH by design: its candidate generation is
corpus-global (a new doc can pair with any historical doc), which no
bounded-state streaming operator expresses honestly. The scheduled
batch pass is INCREMENTAL though: ``operators.dedup.write_lsh_index``
persists the corpus's band buckets, so each scheduled run signatures
only the new slice and ``query_lsh_index``-joins history instead of
re-hashing it (the standard lambda split, with the batch leg append-
only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

# near-dup rescore payload guard (r15, VERDICT r14 #6): same ceiling as
# the batch funnel's ``rescore_max_shingles`` default — a doc whose
# df-capped shingle set exceeds it raises with its id instead of letting
# per-pair array shipping dominate the micro-batch shuffle. Guard only:
# output identical for every conforming batch.
_RESCORE_MAX_SET_SIZE = 250_000

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def stream_documents(
    spark: SparkSession, spool_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming JSON-lines document source with the fixed DOC_SCHEMA
    (streaming readers must never infer schemas — inference reads data
    the planner can't see and breaks checkpoint-restart determinism)."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(spool_dir)


def screen_documents(
    docs: DataFrame,
    min_tokens: int = 5,
    langs: tuple[str, ...] = ("en",),
    max_bigram_repetition: float | None = None,
    normalize: bool = False,
) -> DataFrame:
    """The per-document screens (quality + language + optional repetition),
    streaming-safe: pure row-local expressions, no aggregation at all —
    shared semantics with the batch funnel's stages 3–4. Adds the engine
    columns (n_tokens, lang_pred, __fp).

    ``normalize=True`` prepends the batch funnel's stage 0a byte-hygiene
    pass (``operators.textnorm.clean_text`` — pure codegen projection,
    so streaming-safe) BEFORE fingerprinting, exactly like the batch
    path; normalization is idempotent (textnorm module contract), so
    re-running it over replayed or already-clean batches is a no-op."""
    if normalize:
        from knightshift_spark.operators.textnorm import clean_text

        docs = clean_text(docs, collapse_spaces=True)
    from knightshift_spark.functions.text import (
        doc_fingerprint,
        lang_id,
        token_count,
        tokens,
    )

    annotated = docs.select(
        "*", tokens(F.lower(F.col("text"))).alias("__tk")
    ).select(
        *docs.columns,
        "__tk",  # stays bound for the repetition branch; dropped on return
        doc_fingerprint(F.col("text")).alias("__fp"),
        token_count(F.col("text"), tk=F.col("__tk")).alias("n_tokens"),
        lang_id(F.col("text"), tk=F.col("__tk")).alias("lang_pred"),
    )
    screened = annotated.filter(
        (F.col("n_tokens") >= min_tokens) & F.col("lang_pred").isin(*langs)
    )
    if max_bigram_repetition is not None:
        # the streaming screen uses the row-local duplicate-bigram ratio
        # (no aggregation, no watermark); the full Gopher character-mass
        # family runs in the scheduled batch pass (pipelines.corpus)
        from knightshift_spark.functions.text import repetition_ratio

        screened = screened.select(
            "*", repetition_ratio(F.col("__tk")).alias("__rep")
        ).filter(F.col("__rep") <= max_bigram_repetition).drop("__rep")
    return screened.drop("__tk")


def run_document_stream(
    spark: SparkSession,
    spool_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    max_files_per_trigger: int | None = None,
    min_tokens: int = 5,
    langs: tuple[str, ...] = ("en",),
    max_bigram_repetition: float | None = None,
) -> StreamingQuery:
    """Start the incremental ingestion query: screen → cross-batch exact
    dedup on the text fingerprint → parquet append. The state store holds
    one row per DISTINCT fingerprint ever ingested; replays of a batch
    hit the store and emit nothing, so the append sink stays idempotent.
    """
    docs = stream_documents(spark, spool_dir, max_files_per_trigger)
    screened = screen_documents(docs, min_tokens, langs, max_bigram_repetition)
    deduped = screened.dropDuplicates(["__fp"]).drop("__fp")
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def _ingest_batch_with_lm_gate(
    batch_df: DataFrame,
    target_dir: str,
    lm_table: DataFrame,
    cuts: tuple[float, float],
    keep_buckets: tuple[str, ...],
    unseen_logp: float | None = None,
) -> None:
    """One micro-batch of LM-gated ingestion (foreachBatch body): score
    the batch under the frozen unigram model, bucket against the
    PRECOMPUTED reference cuts (``lmscore.ppl_cuts`` — constants, no
    corpus-global quantile), keep only ``keep_buckets``, append. The
    per-batch cost is one scoring pass over the batch; history is never
    re-scored. ``unseen_logp`` is the model's precomputed OOV log-prob
    (r15, guide §4.5 applied at the runner grain: ``lm_quality_score``
    would otherwise collect it from ``lm_table`` again EVERY batch —
    a per-batch driver job for a constant the model never changes)."""
    from knightshift_spark.operators.lmscore import ppl_bucket_with_cuts

    # checkpoint FIRST, emptiness-check the materialized RDD (r15): the
    # old isEmpty-then-checkpoint order executed the full batch plan
    # once for the take(1) and again for the checkpoint — two
    # executions per batch of the scan+screen subtree; the reorder pays
    # one, and isEmpty on the checkpointed relation is a cached-
    # partition read
    batch = batch_df.localCheckpoint()  # scored once, joined once
    if batch.isEmpty():
        return
    bucketed = ppl_bucket_with_cuts(
        batch, lm_table, cuts, unseen_logp=unseen_logp
    ).select("doc_id", "avg_logprob", "ppl_bucket")
    kept = batch.join(
        bucketed.filter(F.col("ppl_bucket").isin(*keep_buckets)),
        "doc_id",
        "inner",
    )
    kept.write.mode("append").parquet(target_dir)


def run_document_stream_with_lm_gate(
    spark: SparkSession,
    spool_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    lm_table: DataFrame,
    cuts: tuple[float, float],
    keep_buckets: tuple[str, ...] = ("head", "middle"),
    normalize: bool = True,
    trigger: dict | None = None,
    max_files_per_trigger: int | None = None,
    min_tokens: int = 5,
    langs: tuple[str, ...] = ("en", "und"),
    max_bigram_repetition: float | None = None,
) -> StreamingQuery:
    """Incremental ingestion with the round-9 batch stages wired in
    (VERDICT r9 #6): textnorm stage 0a (idempotent byte hygiene, so a
    replayed batch renormalizes to the same bytes) → screens →
    cross-batch exact dedup (state store) → per-batch CCNet LM gate
    against FROZEN reference cuts → parquet append carrying
    (avg_logprob, ppl_bucket) for downstream mixture policy.

    The LM pieces follow the same lambda split as the LSH/anchor legs:
    the expensive corpus-global work (training ``lm_table`` via
    ``unigram_logprob_table``, cutting the distribution via
    ``ppl_cuts``) happens once on the reference corpus; each micro-batch
    pays one scoring pass against broadcast constants. Delivery is
    at-least-once at the corpus boundary (same contract as the near-dup
    runner); the cross-batch fingerprint store makes replays emit
    nothing, so the append stays idempotent in the no-crash path."""
    from knightshift_spark.operators.lmscore import unseen_logprob

    # freeze the MODEL once at stream start (r15, guide §4.5/§5): the
    # caller hands a lazy plan, and every micro-batch would otherwise
    # re-execute the reference-corpus aggregation twice — once building
    # the scoring join's broadcast, once for lm_quality_score's
    # unseen-row collect. The table is vocabulary-sized by module
    # contract (model, not data), so the one-time localCheckpoint is
    # bounded at any corpus scale; the OOV constant rides along as a
    # plain float. Per-batch cost drops to the batch's own scoring pass
    # — which is what the docstring promised all along.
    lm_frozen = lm_table.localCheckpoint()
    unseen = unseen_logprob(lm_frozen)
    docs = stream_documents(spark, spool_dir, max_files_per_trigger)
    screened = screen_documents(
        docs, min_tokens, langs, max_bigram_repetition, normalize=normalize
    )
    deduped = screened.dropDuplicates(["__fp"]).drop("__fp")
    writer = (
        deduped.writeStream.foreachBatch(
            lambda df, _id: _ingest_batch_with_lm_gate(
                df, target_dir, lm_frozen, cuts, keep_buckets,
                unseen_logp=unseen,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def _ingest_batch_with_neardup(
    batch_df: DataFrame,
    target_dir: str,
    index_path: str,
    threshold: float,
) -> None:
    """One micro-batch of the near-dup-aware ingestion (foreachBatch body):
    query the persisted LSH index for candidates (cross-corpus AND
    within-batch), confirm with exact Jaccard over candidate pairs only,
    drop the batch side of every confirmed pair (corpus copy wins;
    within-batch the lower id wins), then append survivors to the corpus
    AND the index."""
    import os

    from pyspark.sql import functions as F

    from knightshift_spark.operators.dedup import (
        append_lsh_index,
        jaccard_rescore_pairs,
        query_lsh_index,
    )

    spark = batch_df.sparkSession
    # checkpoint first, emptiness-check the materialized RDD (r15): see
    # _ingest_batch_with_lm_gate — one execution of the batch plan, not two
    batch = batch_df.localCheckpoint()  # consumed by 4 actions below
    if batch.isEmpty():
        return
    cands = query_lsh_index(
        spark, index_path, batch, include_within_batch=True
    ).localCheckpoint()
    drop_ids = None
    if cands.count():
        texts = batch.select("doc_id", "text")
        if os.path.isdir(target_dir) and any(
            f.endswith(".parquet") for f in os.listdir(target_dir)
        ):
            texts = (
                spark.read.parquet(target_dir)
                .select("doc_id", "text")
                .unionByName(texts)
            )
        cand_ids = cands.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        ).distinct()
        # query_lsh_index orients cross pairs (corpus, batch) while
        # jaccard_pairs emits (lo, hi) — a batch id LOWER than its
        # matched corpus id (replays, backfills, partner drops with
        # older id ranges) would miss a raw [doc_a, doc_b] semi-join.
        # Normalize BOTH relations to (least, greatest) before joining.
        cands_n = cands.select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        ).distinct()
        # r14: pair-driven rescore — the candidate pairs drive an
        # array_intersect join (jaccard_rescore_pairs ≡ the old
        # jaccard_pairs ⋉ cands_n, see the operator docstring); no
        # co-shingled-pair fan-out over the corpus∪batch text slice
        confirmed = jaccard_rescore_pairs(
            cands_n,
            texts.join(cand_ids, "doc_id", "left_semi"),
            threshold=threshold,
            max_set_size=_RESCORE_MAX_SET_SIZE,
        )
        # loser per confirmed pair, by batch membership (NOT id order):
        # cross pair → the batch side loses (corpus copy wins);
        # within-batch pair → the higher id loses (lower id wins)
        bids = batch.select("doc_id").distinct()
        in_a = bids.select(F.col("doc_id").alias("doc_a"), F.lit(True).alias("__ab"))
        in_b = bids.select(F.col("doc_id").alias("doc_b"), F.lit(True).alias("__bb"))
        drop_ids = (
            confirmed.join(in_a, "doc_a", "left")
            .join(in_b, "doc_b", "left")
            .select(
                F.when(
                    F.col("__ab").isNotNull() & F.col("__bb").isNotNull(),
                    F.greatest("doc_a", "doc_b"),
                )
                .when(F.col("__ab").isNotNull(), F.col("doc_a"))
                .otherwise(F.col("doc_b"))
                .alias("doc_id")
            )
            .distinct()
        )
    keep = batch if drop_ids is None else batch.join(drop_ids, "doc_id", "left_anti")
    # corpus first, index second: a crash between the two can only make a
    # replay re-admit rows the corpus already has (reconciled by the
    # scheduled batch dedup), never silently lose rows (the reverse order
    # would drop replayed rows as index hits before they reach the corpus)
    keep.write.mode("append").parquet(target_dir)
    append_lsh_index(keep, index_path)


def _ingest_batch_with_substring_strip(
    batch_df: DataFrame,
    target_dir: str,
    index_path: str,
    merge_gap: int,
) -> None:
    """One micro-batch of substring-dedup-aware ingestion (foreachBatch
    body): cut every span whose content's first occurrence lives in
    corpus HISTORY (the persisted anchor index) or earlier in the batch,
    append the stripped survivors to the corpus, then add the batch's
    novel anchor grams to the index. Corpus first, index second — the
    same crash-ordering argument as the near-dup ingester: a replay can
    only re-admit rows the corpus already holds (duplicate doc_ids the
    scheduled batch dedup reconciles), never strip a replayed batch's
    first occurrences against its own just-appended grams."""
    from knightshift_spark.operators.substring import (
        append_novel_grams,
        strip_against_index,
    )

    # checkpoint first, emptiness-check the materialized RDD (r15): see
    # _ingest_batch_with_lm_gate — one execution of the batch plan, not two
    batch = batch_df.localCheckpoint()  # anchored once, cut once
    if batch.isEmpty():
        return
    # return_fresh hands back the strip's already-materialized novel-gram
    # set, so the post-corpus-write append reuses the first anchor scan
    # instead of re-anchoring the batch and re-running the index
    # anti-join (ADVICE r7)
    stripped, fresh_grams = strip_against_index(
        batch, index_path, merge_gap=merge_gap, append=False, return_fresh=True
    )
    stripped.write.mode("append").parquet(target_dir)
    append_novel_grams(batch, index_path, grams=fresh_grams)


def run_document_stream_with_substring_strip(
    spark: SparkSession,
    spool_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    index_path: str,
    merge_gap: int = 0,
    trigger: dict | None = None,
    max_files_per_trigger: int | None = None,
    min_tokens: int = 5,
    langs: tuple[str, ...] = ("en", "und"),
) -> StreamingQuery:
    """Incremental ExactSubstr ingestion: screens → cross-batch exact
    dedup (state store) → per-batch substring strip against the
    persisted anchor index (``operators.substring.write_anchor_index``
    must have created ``index_path``, possibly over an empty corpus) →
    parquet append + novel-gram append.

    The anchor index is the text twin of the LSH index leg: each batch
    is anchored ONCE and joined against history's gram set — history is
    never re-anchored. Per-batch cost is the batch's own anchor table
    plus one gram-keyed join; the index grows by the batch's NOVEL
    grams only (anti-join keeps it duplicate-free). Delivery is
    at-least-once at the corpus boundary, same as the near-dup runner.
    """
    docs = stream_documents(spark, spool_dir, max_files_per_trigger)
    screened = screen_documents(docs, min_tokens, langs)
    deduped = screened.dropDuplicates(["__fp"]).drop("__fp")
    writer = (
        deduped.writeStream.foreachBatch(
            lambda df, _id: _ingest_batch_with_substring_strip(
                df, target_dir, index_path, merge_gap
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def run_document_stream_with_neardup(
    spark: SparkSession,
    spool_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    index_path: str,
    neardup_threshold: float = 0.7,
    trigger: dict | None = None,
    max_files_per_trigger: int | None = None,
    min_tokens: int = 5,
    langs: tuple[str, ...] = ("en",),
    max_bigram_repetition: float | None = None,
) -> StreamingQuery:
    """The lambda split collapsed into one streaming job: screens →
    cross-batch EXACT dedup (state store) → per-batch NEAR-dup dedup
    against the persisted LSH index (``operators.dedup.write_lsh_index``
    must have created ``index_path``, possibly over an empty corpus) →
    parquet append + index append.

    Near-dup work per batch is bounded by the batch's candidate volume
    (the index join prunes to shared band buckets; only candidate docs'
    texts are re-read for the Jaccard rescore). Delivery is
    at-least-once at the corpus boundary: a crash between the corpus and
    index appends lets a replayed batch re-admit rows the corpus already
    holds — the scheduled batch dedup reconciles; rows are never lost.
    Index appends accumulate small parquet files; compact on the same
    schedule.
    """
    docs = stream_documents(spark, spool_dir, max_files_per_trigger)
    screened = screen_documents(docs, min_tokens, langs, max_bigram_repetition)
    deduped = screened.dropDuplicates(["__fp"]).drop("__fp")
    writer = (
        deduped.writeStream.foreachBatch(
            lambda df, _id: _ingest_batch_with_neardup(
                df, target_dir, index_path, neardup_threshold
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
