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
) -> DataFrame:
    """The per-document screens (quality + language + optional repetition),
    streaming-safe: pure row-local expressions, no aggregation at all —
    shared semantics with the batch funnel's stages 3–4. Adds the engine
    columns (n_tokens, lang_pred, __fp)."""
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
