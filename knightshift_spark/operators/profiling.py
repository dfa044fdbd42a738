"""Table profiling: per-column quality stats in one pass per column.

The data-quality sibling of the cleaning stage: null rates, distinct
counts, min/max — the numbers a 100 TB ingest job logs per batch to
catch upstream drift (a spike in null elos, a new termination token).

Plan shape: one aggregate branch per column, unioned. The tempting
alternative — a single ``agg`` with every column's ``count_distinct`` —
makes Catalyst plan an Expand that multiplies the row stream by
(#distinct-groups + 1) before aggregating: at 100 TB that streams the
table 4× through the shuffle for a 3-column profile (measured 4× slower
at sf0.1 too). The union form column-prunes each branch's parquet scan
to exactly one column, so total bytes read equal the single-scan form
without the row multiplication, and the branches run as parallel stages
of one job.

Assumption: byte parity with a single scan holds for COLUMN-PRUNED
COLUMNAR sources (parquet/ORC). Over a cached DataFrame or a
row-oriented source (JDBC, in-memory rows) each branch re-reads every
column, multiplying IO by the column count — profile such inputs
through a parquet staging write, or accept the multiplier.

``approx=True`` (HLL) drops the exact-distinct shuffle for a true
constant-memory profile on very-high-cardinality columns at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx: bool = False,
    approx_check: float | None = None,
) -> DataFrame:
    """Long-form profile: (column, n_rows, n_nulls, n_distinct, min, max).

    min/max render as strings so one result schema fits every column type.

    ``approx_check=tol`` is the audit mode: computes BOTH the exact and the
    HLL distinct count and keeps the exact value plus a self-verifying
    ``approx_ok`` column (``|approx − exact| / exact ≤ tol``, vacuously
    true when exact = 0) — deterministic output that an exact-SQL oracle
    can reproduce, pinning the sketch's error bound rather than its
    engine-specific estimate.
    """
    cols = list(columns) if columns else [f.name for f in df.schema.fields]
    check = approx_check is not None
    branches = []
    for c in cols:
        v = F.col("v")
        if approx and not check:
            # pure approx mode: no exact distinct anywhere, so a single
            # global agg (one constant-size exchange) covers everything
            branches.append(
                df.select(F.col(c).alias("v")).agg(
                    F.lit(c).alias("column"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(v.isNull().cast("long")).alias("n_nulls"),
                    F.approx_count_distinct("v").alias("n_distinct"),
                    F.min("v").cast("string").alias("min_val"),
                    F.max("v").cast("string").alias("max_val"),
                )
            )
            continue
        # Exact-distinct modes: explicit two-phase agg instead of
        # count_distinct-in-agg. Phase 1 reduces to one slim (v, cnt) row
        # per distinct value (map-side combined), so the shuffle carries
        # two columns — Catalyst's automatic rewrite would instead carry
        # every other aggregate's partial state per group, which in audit
        # mode includes a 52-word HLL buffer per DISTINCT VALUE. Phase 2
        # aggregates the deduped values; the HLL sketch (duplicate-
        # insensitive, so identical over deduped input) exists only in
        # this constant-size stage.
        grouped = (
            df.select(F.col(c).alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        aggs = [
            F.lit(c).alias("column"),
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_rows"),
            F.coalesce(
                F.sum(F.when(v.isNull(), F.col("cnt"))), F.lit(0)
            ).alias("n_nulls"),
            F.count("v").alias("n_distinct"),
        ]
        if check:
            exact = F.count("v")
            ok = F.when(exact == 0, F.lit(True)).otherwise(
                F.abs(F.approx_count_distinct("v") - exact) / exact
                <= float(approx_check)
            )
            aggs.append(ok.alias("approx_ok"))
        aggs += [
            F.min("v").cast("string").alias("min_val"),
            F.max("v").cast("string").alias("max_val"),
        ]
        branches.append(grouped.agg(*aggs))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def numeric_histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: one row per non-empty
    bin — (bin, lo, hi, n) with ``bin`` in [0, bins) and the top edge
    INCLUSIVE in the last bin (max values don't spawn a phantom bin).

    Bounds default to the column's min/max (one cheap extra aggregate —
    parquet statistics usually answer it without a scan); pass them
    explicitly to skip that job or to pin cross-dataset bin edges.
    NULLs are excluded; a degenerate range (min == max) puts everything
    in bin 0. One shuffle on the bin id, map-side combinable — the
    profile pass that sizes skew, spots outliers, and picks range-join
    bin widths at any scale.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(col).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
    if lo is None or hi is None:
        # all-NULL / empty column — also when the caller pinned only ONE
        # bound explicitly (ADVICE r5 #2: the other default stays None)
        return df.sparkSession.createDataFrame(
            [], "bin int, lo double, hi double, n long"
        )
    width = (float(hi) - float(lo)) / bins
    bin_id = (
        F.when(F.lit(width) <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int"),
                F.lit(bins - 1),
            )
        )
        .alias("bin")
    )
    return (
        df.filter(v.isNotNull() & (v >= F.lit(float(lo))) & (v <= F.lit(float(hi))))
        .groupBy(bin_id)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("lo"),
            (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width)).alias("hi"),
            "n",
        )
        .orderBy("bin")
    )


class CorpusCard:
    """Result bundle of ``corpus_card`` — see that function."""

    def __init__(self, overview, by_source, by_lang, token_histogram):
        self.overview = overview
        self.by_source = by_source
        self.by_lang = by_lang
        self.token_histogram = token_histogram


def corpus_card(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = "source",
    hist_bins: int = 10,
) -> CorpusCard:
    """The dataset-card numbers a corpus release ships with, computed
    from the corpus itself (never trusted from upstream metadata):

    - ``overview`` (1 row): n_docs, total_chars, total_tokens,
      n_distinct_texts (normalized fingerprints — 1 - n/n_docs is the
      exact-dup rate), mean_tokens;
    - ``by_source``: per-source doc/token counts + share (when
      ``source_col`` given);
    - ``by_lang``: engine language-ID distribution (lang_pred — the
      curation gate's view of the corpus, not the stored label);
    - ``token_histogram``: equi-width token-length distribution
      (``numeric_histogram``).

    One annotate projection feeds every branch; each output is a lazy
    single-shuffle rollup over it (the caller materializes what it
    reports). The pattern to run BEFORE and AFTER a curation funnel —
    the delta between two cards is the funnel's public story.
    """
    from knightshift_spark.functions.text import (
        doc_fingerprint,
        lang_id,
        token_count,
        tokens,
    )

    annotated = docs.select(
        "*", tokens(F.lower(F.col(text_col))).alias("__tk")
    ).select(
        *docs.columns,
        doc_fingerprint(F.col(text_col)).alias("__fp"),
        token_count(F.col(text_col), tk=F.col("__tk")).alias("__n_tokens"),
        lang_id(F.col(text_col), tk=F.col("__tk")).alias("__lang"),
    )
    overview = annotated.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.length(text_col)), F.lit(0)).alias("total_chars"),
        F.coalesce(F.sum("__n_tokens"), F.lit(0)).alias("total_tokens"),
        F.count_distinct("__fp").alias("n_distinct_texts"),
        F.round(F.avg("__n_tokens"), 4).alias("mean_tokens"),
    )
    total = annotated.agg(F.count(F.lit(1)).alias("__total"))

    def _rollup(key_expr):
        # share via a broadcast 1-row total (a global window would drag
        # the grouped rows onto one partition and warn; same numbers)
        return (
            annotated.groupBy(key_expr)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("__n_tokens").alias("n_tokens"),
            )
            .crossJoin(F.broadcast(total))
            .withColumn("share", F.round(F.col("n_docs") / F.col("__total"), 4))
            .drop("__total")
        )

    by_lang = _rollup(F.col("__lang").alias("lang_pred"))
    by_source = _rollup(F.col(source_col)) if source_col is not None else None
    hist = numeric_histogram(annotated, "__n_tokens", bins=hist_bins)
    return CorpusCard(overview, by_source, by_lang, hist)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-to-snapshot corpus diff: (id, status) with status in
    {added, removed, changed, unchanged} — the release-note companion
    to ``corpus_card`` (two cards say what a corpus IS; the diff says
    what an update DID).

    Both sides reduce to (id, fingerprint) projections before the
    full-outer join, so the shuffle carries 32-byte md5 fingerprints,
    never document text — at corpus scale the diff costs one id-keyed
    join of two slim relations. 'changed' means same id, different
    normalized text.
    """
    from knightshift_spark.functions.text import doc_fingerprint

    o = old.select(
        F.col(id_col).alias("__id"), doc_fingerprint(F.col(text_col)).alias("__fp_o")
    )
    n = new.select(
        F.col(id_col).alias("__id"), doc_fingerprint(F.col(text_col)).alias("__fp_n")
    )
    return (
        o.join(n, "__id", "full_outer")
        .select(
            F.col("__id").alias(id_col),
            F.when(F.col("__fp_o").isNull(), F.lit("added"))
            .when(F.col("__fp_n").isNull(), F.lit("removed"))
            .when(F.col("__fp_o") == F.col("__fp_n"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(status, n) rollup of ``corpus_diff`` — the four release-note
    numbers in one tiny aggregate."""
    return (
        corpus_diff(old, new, id_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )
