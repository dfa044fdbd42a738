"""Gopher-style repetition quality filters (Rae et al. 2021, table A1).

The published corpus-quality filter family the simple per-doc heuristics
in ``functions/text.py`` don't cover: documents dominated by repeated
LINES or repeated word n-grams (boilerplate, navigation chrome,
degenerate generations) are detected by character-mass fractions, not
token counts. All fractions are computed distributed — explode + one
doc-keyed aggregation per family, never a per-doc Python loop — so the
same plan shape holds at corpus scale.

Definitions (word-level adaptation of the paper's filters):
- ``dup_line_frac``: repeated line occurrences / total lines.
- ``dup_line_char_frac``: characters inside repeated line occurrences /
  total line characters (a second copy of a line counts, the first not).
- ``top_{n}gram_char_frac``: characters covered by the single most
  frequent word n-gram / total token characters.
- ``dup_{n}gram_char_frac``: characters covered by n-grams occurring
  more than once / total token characters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knightshift_spark.operators.dedup import word_ngrams_all, word_tokens

# thresholds from Rae et al. 2021 (Gopher), appendix A1: a doc FAILS the
# repetition screen when any fraction exceeds its bound
GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def line_repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_lines, dup_line_frac, dup_line_char_frac). Empty/blank-only
    documents report zero fractions. One explode + two doc-keyed
    aggregations (line-occurrence counting, then per-doc fractions)."""
    lines = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
    ).filter(F.trim("__line") != "")
    per_line = lines.groupBy(id_col, "__line").agg(F.count(F.lit(1)).alias("__c"))
    chars = F.length("__line")
    agg = per_line.groupBy(id_col).agg(
        F.sum("__c").alias("__n_lines"),
        F.sum(F.col("__c") - 1).alias("__n_dup"),
        F.sum(F.col("__c") * chars).alias("__chars"),
        F.sum((F.col("__c") - 1) * chars).alias("__dup_chars"),
    )
    zero = F.lit(0.0)
    return agg.select(
        F.col(id_col),
        F.col("__n_lines").cast("long").alias("n_lines"),
        F.when(F.col("__n_lines") == 0, zero)
        .otherwise(F.round(F.col("__n_dup") / F.col("__n_lines"), 4))
        .alias("dup_line_frac"),
        F.when(F.col("__chars") == 0, zero)
        .otherwise(F.round(F.col("__dup_chars") / F.col("__chars"), 4))
        .alias("dup_line_char_frac"),
    )


def ngram_repetition_stats(
    docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, top_ngram_char_frac, dup_ngram_char_frac) for word ``n``-grams.

    Character mass of a gram occurrence is its non-space character count
    (``length - (n-1)`` separators); the denominator is the doc's total
    n-gram character mass, so a doc that is ONE phrase repeated forever
    approaches fraction 1. The top gram ties deterministically (largest
    gram string at equal mass).
    """
    tk = docs.select(id_col, word_tokens(F.col(text_col)).alias("__tk"))
    grams = tk.select(
        F.col(id_col), F.explode(word_ngrams_all(F.col("__tk"), n)).alias("__g")
    )
    per_gram = grams.groupBy(id_col, "__g").agg(F.count(F.lit(1)).alias("__c"))
    mass = F.col("__c") * (F.length("__g") - (n - 1))
    agg = per_gram.groupBy(id_col).agg(
        F.sum(mass).alias("__total"),
        # max by (mass, gram) → deterministic tie-break (largest gram
        # string at equal mass); only the mass leaves the struct
        F.max(F.struct(mass.alias("m"), F.col("__g").alias("g"))).alias("__top"),
        F.sum(F.when(F.col("__c") > 1, mass).otherwise(F.lit(0))).alias("__dup"),
    )
    zero = F.lit(0.0)
    return agg.select(
        F.col(id_col),
        F.when(F.col("__total") == 0, zero)
        .otherwise(F.round(F.col("__top.m") / F.col("__total"), 4))
        .alias(f"top_{n}gram_char_frac"),
        F.when(F.col("__total") == 0, zero)
        .otherwise(F.round(F.col("__dup") / F.col("__total"), 4))
        .alias(f"dup_{n}gram_char_frac"),
    )


def gopher_repetition_stats(
    docs: DataFrame,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full repetition profile: line stats joined with the requested
    n-gram families, one row per document (docs with no content report
    zeros via the left joins). Each family is its own explode+agg —
    ``len(top_ns ∪ dup_ns) + 1`` doc-keyed shuffles, all map-side
    combinable, none carrying raw text past its explode."""
    out = docs.select(id_col).distinct().join(
        line_repetition_stats(docs, id_col, text_col), id_col, "left"
    )
    for n in sorted(set(top_ns) | set(dup_ns)):
        stats = ngram_repetition_stats(docs, n, id_col, text_col)
        cols = [id_col]
        if n in top_ns:
            cols.append(f"top_{n}gram_char_frac")
        if n in dup_ns:
            cols.append(f"dup_{n}gram_char_frac")
        out = out.join(stats.select(*cols), id_col, "left")
    fill = {
        c: 0.0 for c in out.columns if c.endswith("_frac")
    } | {"n_lines": 0}
    return out.fillna(fill)


def gopher_repetition_filter(
    docs: DataFrame,
    thresholds: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents PASSING the repetition screen (every fraction at or
    under its threshold — the Gopher rule is reject-if-any-exceeds).
    ``thresholds`` defaults to the published bounds; pass a subset dict
    to screen on fewer families cheaply — only the families a threshold
    names are computed. Unknown keys raise (a typo'd key would otherwise
    silently weaken the screen to a no-op)."""
    import re

    th = dict(GOPHER_THRESHOLDS if thresholds is None else thresholds)
    line_keys = {"dup_line_frac", "dup_line_char_frac"}
    gram_rx = re.compile(r"^(top|dup)_(\d+)gram_char_frac$")
    top_ns, dup_ns = [], []
    for k in th:
        m = gram_rx.match(k)
        if m:
            (top_ns if m.group(1) == "top" else dup_ns).append(int(m.group(2)))
        elif k not in line_keys:
            raise ValueError(
                f"unknown repetition threshold {k!r}; expected one of "
                f"{sorted(line_keys)} or (top|dup)_<n>gram_char_frac"
            )
    stats = gopher_repetition_stats(
        docs, tuple(top_ns), tuple(dup_ns), id_col, text_col
    )
    cond = None
    for name, bound in th.items():
        c = F.col(name) <= F.lit(bound)
        cond = c if cond is None else cond & c
    keep = stats.filter(cond if cond is not None else F.lit(True)).select(id_col)
    return docs.join(keep, id_col, "left_semi")
