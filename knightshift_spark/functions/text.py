"""Text-analysis column functions (training-data pipeline ops).

All native Catalyst expressions (split / filter / aggregate / md5) so the
hot path stays inside whole-stage codegen — no Python UDFs. These are the
building blocks a 100 TB document pipeline runs per-row, so per-row cost
dominates: everything here is a single projection, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal deterministic stopword lists for the lang-ID heuristic / quality
# scoring. Deliberately tiny and frozen: they are part of the declared
# query contract (oracle SQL embeds the same lists).
STOPWORDS_EN = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be", "are",
)
STOPWORDS_FR = ("le", "la", "les", "de", "des", "un", "une", "et", "est", "que")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "von")
STOPWORDS_ES = ("el", "la", "los", "las", "de", "un", "una", "y", "es", "que")


def sql_array(words: tuple[str, ...]) -> str:
    """Render a Python tuple as a DuckDB list literal for oracle SQL."""
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def tokens(c: Column) -> Column:
    """Whitespace tokens; empty/blank text → empty array (not [''])."""
    return F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), r"\s+")
    )


def token_count(c: Column, tk: Column | None = None) -> Column:
    """Whitespace token count (BPE-ish subword counting is a multiplier on
    this at the pipeline level; whitespace is the deterministic contract).
    Pass a pre-bound token array ``tk`` to skip re-splitting."""
    return F.size(tokens(c) if tk is None else tk)


def repetition_ratio(tk: Column) -> Column:
    """Within-document repetition: 1 − distinct-bigrams ⁄ total-bigrams
    over a BOUND token-array column (Gopher-style duplicate-n-gram quality
    signal — boilerplate and degenerate generations score high). Pass a
    materialized array column, not an inline ``tokens(...)`` expression:
    the bigram lambda re-evaluates its operand per element when inlined.
    Docs with fewer than 2 tokens score 0.0."""
    from knightshift_spark.operators.dedup import word_bigrams

    n_bigrams = F.size(tk) - 1
    n_distinct = F.size(word_bigrams(tk))
    return F.when(F.size(tk) < 2, F.lit(0.0)).otherwise(
        F.lit(1.0) - n_distinct.cast("double") / n_bigrams
    )


def normalize_text(c: Column) -> Column:
    """Lowercase + collapse all whitespace runs to single spaces + trim."""
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def doc_fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    Used for exact near-canonical dedup: two docs differing only in case /
    whitespace collide. (A rolling/winnowing fingerprint is layered on
    shingles in ``operators/dedup.py``.)
    """
    return F.md5(normalize_text(c).cast("binary"))


def stopword_ratio(
    c: Column, stopwords: tuple[str, ...] = STOPWORDS_EN, tk: Column | None = None
) -> Column:
    """``tk``, when given, must be LOWERCASED tokens (the stopword lists
    are lowercase)."""
    tk = tokens(F.lower(c)) if tk is None else tk
    n = F.size(tk)
    sw = F.size(F.filter(tk, lambda x: x.isin(*stopwords)))
    return F.when(n == 0, F.lit(0.0)).otherwise(sw.cast("double") / n)


def quality_score(c: Column) -> Column:
    """Composite quality heuristic in [0,1]: penalize very short docs and
    reward plausible stopword density (the classic C4-style filters)."""
    tk = tokens(F.lower(c))
    n = F.size(tk)
    sw_ratio = stopword_ratio(c)
    len_term = F.least(n.cast("double") / 50.0, F.lit(1.0))
    sw_term = F.least(sw_ratio * 5.0, F.lit(1.0))
    return F.round((len_term + sw_term) / 2.0, 4)


def lang_id(c: Column, tk: Column | None = None) -> Column:
    """Stopword-vote language ID: highest hit-count wins; ties and
    low-evidence (<10% of tokens) → ``und``. Deterministic by fixed
    language order (en, fr, de, es). ``tk``, when given, must be
    LOWERCASED tokens."""
    tk = tokens(F.lower(c)) if tk is None else tk
    n = F.size(tk)

    def hits(words: tuple[str, ...]) -> Column:
        return F.size(F.filter(tk, lambda x: x.isin(*words)))

    en, fr, de, es = (
        hits(STOPWORDS_EN),
        hits(STOPWORDS_FR),
        hits(STOPWORDS_DE),
        hits(STOPWORDS_ES),
    )
    best = F.greatest(en, fr, de, es)
    return (
        F.when((n == 0) | (best * 10 < n), F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(fr == best, F.lit("fr"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("es"))
    )
