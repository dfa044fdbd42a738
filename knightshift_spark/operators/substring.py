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


def _anchor_table(
    docs: DataFrame, k: int, density: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, gram) — 1-based anchor positions. The gram/hash arrays
    are bound as separate projections (HOF-CSE rule, SCALE.md)."""
    n = F.length(F.col("__t"))
    positions = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    structs = F.transform(
        positions,
        lambda p: F.struct(p.alias("pos"), F.col("__t").substr(p, F.lit(k)).alias("gram")),
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
    first = Window.partitionBy("gram").orderBy("__id", "pos")
    dup = (
        anchors.withColumn("__rn", F.row_number().over(first))
        .filter(F.col("__rn") > 1)
        .select("__id", "pos", (F.col("pos") + (k - 1)).alias("__end"))
    )
    # gaps-and-islands: a window starts a new span when its position
    # exceeds the running max end (+ merge_gap) of earlier windows
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
