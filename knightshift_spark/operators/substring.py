"""Substring-level exact dedup (the ExactSubstr recipe, Spark-first).

Document- and paragraph-level dedup miss the dominant real-world shape:
documents that are mostly unique but EMBED a long duplicated region
(licenses, boilerplate headers, quoted articles). Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") remove any
substring duplicated across the corpus above a length threshold using
suffix arrays — a data structure with no honest distributed form. This
module reaches the same behavior with CONTENT-DEFINED ANCHORS, all in
DataFrame ops:

1. every character k-gram whose portable hash ≡ 0 (mod density) is an
   ANCHOR — selection depends only on the k-gram's content, so the same
   duplicated region selects the same anchors in EVERY copy, at any
   alignment, in any document (the winnowing/CDC trick; k plays the
   role of the published min-match length, density the index
   sparsity);
2. anchor occurrences group by their literal gram text (exact — hash
   only gates selection, equality is on the string): the globally first
   occurrence (min id, then position) keeps its text, every later
   occurrence marks a duplicated k-window;
3. per document, marked windows merge into maximal spans
   (gaps-and-islands over a doc-keyed window function);
4. ``strip_duplicated_spans`` cuts the spans with one JVM-side
   ``aggregate`` over the sorted span array — no Python in the data
   path anywhere.

Catch guarantee: a duplicated region of length L ≥ k contains an anchor
with probability 1 − (1 − 1/density)^(L−k+1) (deterministic given
content; density=1 makes every duplicated k-gram certain to be caught).
Removal granularity is the anchor window extent — boundary characters
of a duplicated region shorter than k beyond its last anchor survive.
Scale shape: the anchor table is ~chars/density rows of k-byte grams;
the only corpus-wide shuffle is the gram-keyed first-occurrence window
plus one doc-keyed span merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from knightshift_spark.operators.dedup import stable_hash32
from knightshift_spark.plans.partitioning import lint_checkpoint


def _anchor_table(
    docs: DataFrame, k: int, density: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, gram) — 1-based anchor positions. The gram/hash arrays
    are bound as separate projections (HOF-CSE rule, SCALE.md)."""
    n = F.length(F.col("__t"))
    # the `n < k` guard matters: Spark's sequence(1, n-k+1) is a
    # DESCENDING [1, 0] when n < k, not empty (the word_ngrams_all
    # trap) — a 2-char doc would fabricate two anchors of the same
    # gram and cut itself to ""
    structs = F.when(
        n < k, F.array().cast("array<struct<pos:int,gram:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda p: F.struct(
                p.cast("int").alias("pos"),
                F.col("__t").substr(p, F.lit(k)).alias("gram"),
            ),
        )
    )
    anchors = F.filter(
        F.col("__cand"),
        lambda s: F.pmod(stable_hash32(s["gram"]), F.lit(density)) == 0,
    )
    return (
        docs.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
        .filter(F.col("__t").isNotNull())
        .select("__id", structs.alias("__cand"))
        .select("__id", F.explode(anchors).alias("__a"))
        .select("__id", F.col("__a.pos").alias("pos"), F.col("__a.gram").alias("gram"))
    )


def duplicated_spans(
    docs: DataFrame,
    k: int = 40,
    density: int = 8,
    merge_gap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, start, end) — maximal character spans (1-based, inclusive)
    duplicating content whose globally-first occurrence lies elsewhere
    (earlier document, or earlier position in the same document).
    ``merge_gap`` additionally merges spans separated by at most that
    many characters (duplicated regions longer than k produce anchor
    windows ~density apart; a gap near ``density`` stitches them)."""
    anchors = _anchor_table(docs, k, density, id_col, text_col)
    return _merge_windows(_later_occurrences(anchors, k), merge_gap, id_col)


def _later_occurrences(anchors: DataFrame, k: int) -> DataFrame:
    """(id, pos, __end) windows of every anchor occurrence AFTER the
    globally first one (first = min id, then min pos) — the first-wins
    rule both the one-shot and incremental paths share."""
    first = Window.partitionBy("gram").orderBy("__id", "pos")
    return (
        anchors.withColumn("__rn", F.row_number().over(first))
        .filter(F.col("__rn") > 1)
        .select("__id", "pos", (F.col("pos") + (k - 1)).alias("__end"))
    )


def _merge_windows(dup: DataFrame, merge_gap: int, id_col: str) -> DataFrame:
    """Merge (id, pos, __end) k-windows into maximal (id, start, end)
    spans — gaps-and-islands: a window starts a new span when its
    position exceeds the running max end (+ merge_gap) of earlier
    windows."""
    byid = Window.partitionBy("__id").orderBy("pos")
    prev_end = F.max("__end").over(byid.rowsBetween(Window.unboundedPreceding, -1))
    islands = dup.withColumn(
        "__new", (F.col("pos") > prev_end + 1 + merge_gap).cast("int")
    ).withColumn(
        "__island",
        F.sum(F.coalesce(F.col("__new"), F.lit(1))).over(
            byid.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy("__id", "__island")
        .agg(F.min("pos").alias("start"), F.max("__end").alias("end"))
        .select(F.col("__id").alias(id_col), "start", "end")
    )


def strip_duplicated_spans(
    docs: DataFrame,
    k: int = 40,
    density: int = 8,
    merge_gap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents with every duplicated span cut out (first occurrence
    keeps its text; all columns pass through, ``text_col`` replaced).
    The cut is ONE ``aggregate`` over each doc's sorted span array:
    the accumulator walks (last_end, acc), appending the clean slice
    before each span — pure JVM expressions, no Python."""
    spans = duplicated_spans(docs, k, density, merge_gap, id_col, text_col)
    return _cut_spans(docs, spans, id_col, text_col)


def _cut_spans(
    docs: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Cut (start, end) spans out of ``text_col`` — the shared tail of
    the one-shot and incremental strip paths."""
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("start", "end"))).alias("__spans")
    )
    out = docs.join(per_doc, id_col, "left")
    t = F.col(text_col)
    cut = F.aggregate(
        F.col("__spans"),
        F.struct(F.lit(0).cast("long").alias("last"), F.lit("").alias("acc")),
        lambda acc, s: F.struct(
            F.greatest(acc["last"], s["end"].cast("long")).alias("last"),
            F.concat(
                acc["acc"],
                F.when(
                    s["start"].cast("long") > acc["last"] + 1,
                    t.substr(
                        (acc["last"] + 1).cast("int"),
                        (s["start"] - acc["last"] - 1).cast("int"),
                    ),
                ).otherwise(F.lit("")),
            ).alias("acc"),
        ),
        lambda acc: F.concat(
            acc["acc"], t.substr((acc["last"] + 1).cast("int"), F.length(t))
        ),
    )
    return out.withColumn(
        text_col, F.when(F.col("__spans").isNull(), t).otherwise(cut)
    ).drop("__spans")


def write_anchor_index(
    docs: DataFrame,
    path: str,
    k: int = 40,
    density: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Persist the corpus's distinct anchor grams — the incremental
    substring-dedup state (the text twin of ``write_lsh_index``): anchor
    the corpus ONCE, then every future batch strips against the index
    instead of re-anchoring history. Layout: (gram) parquet + a
    ``_anchor_meta`` sidecar pinning (k, density) so writer/reader
    config drift errors instead of silently missing duplicates."""
    grams = (
        _anchor_table(docs, k, density, id_col, text_col)
        .select("gram")
        .distinct()
    )
    grams.write.mode(mode).parquet(path)
    docs.sparkSession.createDataFrame(
        [(k, density)], "k int, density int"
    ).write.mode("overwrite").parquet(f"{path}/_anchor_meta")


def _anchor_meta(spark, path: str) -> tuple[int, int]:
    meta = spark.read.parquet(f"{path}/_anchor_meta").collect()[0]
    return int(meta["k"]), int(meta["density"])


def strip_against_index(
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    merge_gap: int = 0,
    append: bool = True,
    return_fresh: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Incrementally strip a NEW batch against the persisted index:
    every batch occurrence of an INDEXED gram is a duplicate (its first
    occurrence lives in corpus history); grams new to the index follow
    the usual within-batch first-wins rule. With ``append=True`` the
    batch's novel grams join the index afterwards (anti-join + append,
    so the index stays duplicate-free), making

        for b in batches: out += strip_against_index(b, path)

    produce EXACTLY ``strip_duplicated_spans`` of the concatenated
    corpus when batches arrive in id order (pinned by test). The batch
    is materialized once (localCheckpoint) because the strip and the
    index append both consume its anchor table; the SPANS are
    materialized too, BEFORE the append, so the returned DataFrame no
    longer depends on reading ``path`` — otherwise any re-listing of
    the index directory (refreshByPath, FileStatusCache invalidation,
    evaluating the result after this call returns) would read the
    batch's just-appended grams as historical and strip their first
    occurrences as well.

    ``return_fresh=True`` returns ``(stripped, fresh_grams)`` where
    ``fresh_grams`` is the batch's index-novel gram set, ALREADY
    materialized (the anti-join is checkpointed — it feeds both the
    within-batch dedup and this return), so a corpus-first/index-second
    ingester can hand it to ``append_novel_grams(grams=...)`` after the
    corpus write without re-anchoring the batch (ADVICE r7)."""
    spark = batch.sparkSession
    k, density = _anchor_meta(spark, path)
    anchors = lint_checkpoint(
        _anchor_table(batch, k, density, id_col, text_col),
        "strip_against_index.anchors",
        eager=True,
    )
    index = spark.read.schema("gram string").parquet(path)
    hist = anchors.join(index, "gram", "left_semi").select(
        "__id", "pos", (F.col("pos") + (k - 1)).alias("__end")
    )
    # materialized once: consumed by the within-batch first-occurrence
    # pass AND by the index-append / return_fresh leg — and after the
    # checkpoint it no longer reads ``path`` either
    fresh = lint_checkpoint(
        anchors.join(index, "gram", "left_anti"),
        "strip_against_index.fresh",
        eager=True,
    )
    dup = hist.unionByName(_later_occurrences(fresh, k))
    spans = lint_checkpoint(
        _merge_windows(dup, merge_gap, id_col),
        "strip_against_index.spans",
        eager=True,
    )
    out = _cut_spans(batch, spans, id_col, text_col)
    fresh_grams = fresh.select("gram").distinct()
    if append:
        fresh_grams.write.mode("append").parquet(path)
    if return_fresh:
        return out, fresh_grams
    return out


def append_novel_grams(
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    grams: DataFrame | None = None,
) -> None:
    """Append the batch's index-novel anchor grams WITHOUT stripping —
    the second half of ``strip_against_index`` split out so a streaming
    ingester can order writes corpus-FIRST, index-second: a crash
    between the two then only re-admits already-landed rows on replay
    (reconciled by the scheduled batch dedup) instead of re-stripping a
    replayed batch's first occurrences against its own grams (text
    loss). The anti-join keeps the index duplicate-free.

    ``grams`` takes a precomputed novel-gram set (the ``return_fresh``
    leg of ``strip_against_index``) so callers that just stripped the
    same batch don't pay the per-position anchor scan and the index
    anti-join a second time (ADVICE r7)."""
    if grams is not None:
        grams.write.mode("append").parquet(path)
        return
    spark = batch.sparkSession
    k, density = _anchor_meta(spark, path)
    anchors = _anchor_table(batch, k, density, id_col, text_col)
    index = spark.read.schema("gram string").parquet(path)
    fresh = anchors.join(index, "gram", "left_anti").select("gram").distinct()
    fresh.write.mode("append").parquet(path)
