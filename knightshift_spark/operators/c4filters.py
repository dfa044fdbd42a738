"""C4 cleaning rules (Raffel et al. 2020, §2.2) — the published line- and
document-level heuristics the C4 corpus was built with, as engine
operators. These complement the statistical screens the engine already
has (Gopher repetition in ``quality.py``, LM scoring in ``lmscore.py``):
C4's rules are structural — what a LINE must look like to be prose, what
a PAGE must not contain.

Line rules (``c4_line_filter`` — drop the line, keep the doc):
- ends in terminal punctuation (``. ! ? "``);
- has at least ``min_words`` words;
- does not contain any ``drop_markers`` token (default: "javascript" —
  the C4 tell for scraped chrome), case-insensitively.

Document rules (``c4_doc_filter`` — drop the whole doc):
- at least ``min_sentences`` sentences (terminal-punct occurrences);
- none of ``bad_phrases`` (default "lorem ipsum");
- no curly brace (code, not prose).

Scale shape: the line filter is split → posexplode → filter →
doc-keyed reassembly (the ``dedup_paragraphs`` shape — one bounded
shuffle on the doc key); the doc filter is a pure row-local predicate
over the scan. Everything is native expressions, DuckDB-oracle-tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_PUNCT = (".", "!", "?", '"')


def _line_ok(
    line: Column,
    min_words: int,
    drop_markers: tuple[str, ...],
) -> Column:
    trimmed = F.trim(line)
    ok = trimmed.rlike(r'[.!?"]$')
    ok = ok & (F.size(F.split(trimmed, r"\s+")) >= min_words)
    for marker in drop_markers:
        ok = ok & ~F.lower(trimmed).contains(marker.lower())
    return ok


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    drop_markers: tuple[str, ...] = ("javascript",),
    sep: str = "\n",
) -> DataFrame:
    """Remove non-prose lines, reassemble documents in line order; docs
    whose every line fails drop out entirely. Non-text columns pass
    through (doc-keyed join back, same bounded shuffle)."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__line"),
    ).filter(_line_ok(F.col("__line"), min_words, drop_markers))
    rebuilt = lines.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__line")))
                ),
                lambda s: s["__line"],
            ),
            sep,
        ).alias(text_col)
    )
    others = [c for c in docs.columns if c != text_col]
    return docs.select(*others).join(rebuilt, id_col)


def c4_doc_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_sentences: int = 3,
    bad_phrases: tuple[str, ...] = ("lorem ipsum",),
    drop_curly: bool = True,
) -> DataFrame:
    """Keep only documents passing the page-level C4 rules."""
    t = F.lower(F.col(text_col))
    keep = F.regexp_count(F.col(text_col), F.lit(r"[.!?]")) >= min_sentences
    for phrase in bad_phrases:
        keep = keep & ~t.contains(phrase.lower())
    if drop_curly:
        keep = keep & ~F.col(text_col).contains("{")
    return docs.filter(keep)


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """The published composition: line filter first (C4 applies page
    rules to the line-cleaned text), then the document rules."""
    cleaned = c4_line_filter(docs, id_col, text_col, min_words, sep=sep)
    return c4_doc_filter(cleaned, text_col, min_sentences)
