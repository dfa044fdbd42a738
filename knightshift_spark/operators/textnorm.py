"""Unicode text normalization — the pass a crawl corpus runs BEFORE any
hashing, shingling, or quality screen.

Raw web text mixes full-width compatibility forms (Ａ vs A), ligatures
(ﬁ vs fi), composed/decomposed accents (é as one codepoint or two),
zero-width joiners, BOMs, and stray C0/C1 control bytes. Every
downstream operator in this engine keys on EXACT bytes (md5
fingerprints, shingle hashes, gram joins), so two visually-identical
documents that differ only in normalization form silently escape every
dedup pass. Normalize first; hash second.

Two tiers, matching the engine's seam policy:

- ``clean_text`` — a pure Catalyst projection (codegen, JVM-side):
  strips control characters (keeping ``\\n`` and ``\\t``), zero-width
  characters and BOMs, optionally collapses runs of spaces/tabs. This
  covers the byte-noise part and runs at scan speed with zero Python.
- ``nfkc_normalize`` — true Unicode normalization (NFC/NFKC/NFD/NFKD)
  via ``unicodedata`` behind an Arrow ``mapInPandas`` seam, the same
  pattern as the media codecs: Spark has no normalization builtin, so
  this is the documented slow path, batched columnar, never
  row-at-a-time pickling. Schema is preserved; only the text column is
  rewritten.

Normalization is idempotent (normalize∘normalize = normalize), so
re-running the pass over an already-clean corpus is a no-op — safe to
keep in an incremental ingestion path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C0/C1 controls except \t (09) and \n (0A); plus DEL. \r is folded into
# \n first so Windows line endings normalize instead of being stripped.
_CONTROL_RX = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x80-\x9F]"
# zero-width space/non-joiner/joiner, word joiner, BOM/ZWNBSP
_ZERO_WIDTH_RX = "[​‌‍⁠﻿]"


def clean_text_expr(
    c: Column, collapse_spaces: bool = False
) -> Column:
    """JVM-side byte hygiene: CRLF→LF, control chars and zero-width
    marks stripped; optionally collapse space/tab runs to one space.
    NULL passes through (a raw crawl always has null-text rows)."""
    out = F.regexp_replace(c, "\r\n?", "\n")
    out = F.regexp_replace(out, _CONTROL_RX, "")
    out = F.regexp_replace(out, _ZERO_WIDTH_RX, "")
    if collapse_spaces:
        out = F.regexp_replace(out, "[ \t]+", " ")
    return out


def clean_text(
    docs: DataFrame, text_col: str = "text", collapse_spaces: bool = False
) -> DataFrame:
    """``clean_text_expr`` applied in place — a transform, not a filter."""
    return docs.withColumn(
        text_col, clean_text_expr(F.col(text_col), collapse_spaces)
    )


def nfkc_normalize(
    docs: DataFrame, text_col: str = "text", form: str = "NFKC"
) -> DataFrame:
    """Rewrite ``text_col`` into Unicode normalization ``form`` (NFC,
    NFKC, NFD, NFKD) through an Arrow ``mapInPandas`` seam (module
    docstring). All other columns pass through untouched."""
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")
    schema = docs.schema
    idx = schema.fieldNames().index(text_col)  # raises if absent

    def run(batches):
        for pdf in batches:
            col = pdf.iloc[:, idx]
            pdf.iloc[:, idx] = col.map(
                lambda s: unicodedata.normalize(form, s) if s is not None else None
            )
            yield pdf

    return docs.mapInPandas(run, schema)


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    form: str | None = "NFKC",
    collapse_spaces: bool = False,
) -> DataFrame:
    """The full pass: JVM byte hygiene, then (if ``form``) Unicode
    normalization. ``form=None`` keeps the whole pass inside codegen."""
    out = clean_text(docs, text_col, collapse_spaces)
    if form is not None:
        out = nfkc_normalize(out, text_col, form)
    return out
