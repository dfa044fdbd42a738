"""PII redaction — the scrubbing pass every released training corpus runs.

The reference pipeline stores raw chess/user text only, but an engine
curating web-scale training data must strip personal identifiers before
the corpus leaves the pipeline (the standard pre-release stage in C4/
RefinedWeb-style curation). Everything here is native ``regexp_replace``
/ ``regexp_count`` column expressions — JVM-side, whole-stage codegen,
zero Python in the job — so the scrub costs one projection at any scale.

Pattern design constraints:
- engine-portable: only regex constructs shared by Java (Spark) and RE2
  (DuckDB oracle) — character classes, bounded repetition, alternation,
  ``\\b``; no lookbehind, no backreferences;
- ordered: categories apply most-specific-first (EMAIL before PHONE so
  the digits in ``user123@...`` are never half-eaten; CARD/SSN before
  PHONE because a 16-digit card number contains phone-shaped runs);
- replacement tokens are angle-bracket markers (``<EMAIL>``...) —
  idempotent by construction (markers contain no redactable text, so
  redacting twice equals redacting once).

False positives are the accepted trade (a 16-digit invoice number reads
as a card); production pipelines tune patterns per corpus. The operator
contract — ordered category map, one fused projection, per-category
counts — is the engine part.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: applied top to bottom (see module docstring)
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IPV4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "SSN": r"\b\d{3}-\d{2}-\d{4}\b",
    "CARD": r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b",
    "PHONE": r"\b\+?\d{1,3}[ -.]\(?\d{2,4}\)?[ -.]\d{3,4}[ -.]?\d{0,4}\b",
}


def redact_expr(text: Column, patterns: dict[str, str] | None = None) -> Column:
    """The scrub as one chained column expression: each category's
    matches replaced by its ``<CATEGORY>`` marker, in map order."""
    out = text
    for name, rx in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, rx, f"<{name}>")
    return out


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """All columns preserved, ``text_col`` scrubbed (or written to
    ``out_col`` when given, keeping the original for audit)."""
    target = out_col or text_col
    return docs.withColumn(target, redact_expr(F.col(text_col), patterns))


def pii_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document match counts: (id, n_<category>..., n_pii_total) —
    the audit/threshold signal (docs above a PII density cut are usually
    dropped rather than scrubbed). Counts are measured on the SAME
    sequential-application order as the scrub (each category counts on
    the text with earlier categories already replaced), so
    ``n_pii_total`` equals the number of markers ``redact_pii`` emits.
    """
    pats = patterns or PII_PATTERNS
    cols: list[Column] = [F.col(id_col)]
    scrubbed = F.col(text_col)
    names = []
    for name, rx in pats.items():
        cols.append(F.regexp_count(scrubbed, F.lit(rx)).alias(f"n_{name.lower()}"))
        scrubbed = F.regexp_replace(scrubbed, rx, f"<{name}>")
        names.append(f"n_{name.lower()}")
    out = docs.select(*cols)
    total = None
    for n in names:
        total = F.col(n) if total is None else total + F.col(n)
    return out.withColumn("n_pii_total", total.cast("bigint"))
