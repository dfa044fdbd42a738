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
    gram string at equal mass). Single-family view of
    ``ngram_repetition_multi``.
    """
    return ngram_repetition_multi(docs, (n,), id_col=id_col, text_col=text_col)


def ngram_repetition_multi(
    docs: DataFrame,
    ns: tuple[int, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Repetition fractions for SEVERAL n-gram families in one pass:
    (id, top_{n}gram_char_frac, dup_{n}gram_char_frac for every n).

    All families share one tokenize + one tagged explode
    (struct(n, gram)) and two doc-keyed aggregations — gram-occurrence
    counting on (id, n, gram), then conditional per-family sums on id —
    instead of an explode + two shuffles PER family. At corpus scale the
    explode output (every n-gram occurrence of every doc) dominates the
    job, so folding k families into one pass cuts the heavy stage k-fold;
    the Gopher screen's 10 families become one scan, one explode, two
    shuffles. Docs with no grams of ANY family are absent from the
    output (callers left-join + fill 0.0, matching the per-family
    contract); a doc lacking only SOME family reports 0.0 there.
    """
    ns = tuple(sorted(set(ns)))
    tk = docs.select(id_col, word_tokens(F.col(text_col)).alias("__tk"))

    # closure factory, NOT `lambda g, n=n: ...` — a two-parameter lambda
    # would be called by F.transform as (element, INDEX) and silently tag
    # every gram with its array position instead of the family size
    def _tag(n: int):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    tagged = F.concat(
        *[F.transform(word_ngrams_all(F.col("__tk"), n), _tag(n)) for n in ns]
    )
    grams = tk.select(F.col(id_col), F.explode(tagged).alias("__t")).select(
        id_col,
        F.col("__t.n").alias("__n"),
        F.col("__t.g").alias("__g"),
    )
    per_gram = grams.groupBy(id_col, "__n", "__g").agg(
        F.count(F.lit(1)).alias("__c")
    )
    mass = F.col("__c") * (F.length("__g") - (F.col("__n") - 1))
    aggs = []
    for n in ns:
        is_n = F.col("__n") == n
        aggs += [
            F.sum(F.when(is_n, mass)).alias(f"__total_{n}"),
            # max by (mass, gram) → deterministic tie-break (largest gram
            # string at equal mass); only the mass leaves the struct
            F.max(
                F.when(is_n, F.struct(mass.alias("m"), F.col("__g").alias("g")))
            ).alias(f"__top_{n}"),
            F.sum(
                F.when(is_n & (F.col("__c") > 1), mass).otherwise(F.lit(0))
            ).alias(f"__dup_{n}"),
        ]
    agg = per_gram.groupBy(id_col).agg(*aggs)
    zero = F.lit(0.0)
    sel = [F.col(id_col)]
    for n in ns:
        total = F.col(f"__total_{n}")
        absent = total.isNull() | (total == 0)
        sel.append(
            F.when(absent, zero)
            .otherwise(F.round(F.col(f"__top_{n}.m") / total, 4))
            .alias(f"top_{n}gram_char_frac")
        )
        sel.append(
            F.when(absent, zero)
            .otherwise(F.round(F.col(f"__dup_{n}") / total, 4))
            .alias(f"dup_{n}gram_char_frac")
        )
    return agg.select(*sel)


def gopher_repetition_stats(
    docs: DataFrame,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full repetition profile: line stats joined with the requested
    n-gram families, one row per document (docs with no content report
    zeros via the left joins). ALL n-gram families ride ONE tagged
    explode + two doc-keyed aggregations (``ngram_repetition_multi``);
    lines are their own explode+agg — so the full Gopher screen costs
    one text scan per kind, not one per family, and every aggregation
    is map-side combinable with no raw text past its explode."""
    out = docs.select(id_col).distinct().join(
        line_repetition_stats(docs, id_col, text_col), id_col, "left"
    )
    ns = tuple(sorted(set(top_ns) | set(dup_ns)))
    if ns:
        cols = [id_col]
        for n in ns:
            if n in top_ns:
                cols.append(f"top_{n}gram_char_frac")
            if n in dup_ns:
                cols.append(f"dup_{n}gram_char_frac")
        stats = ngram_repetition_multi(docs, ns, id_col, text_col)
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
