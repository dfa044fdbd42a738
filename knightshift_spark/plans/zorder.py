"""Z-order (Morton) clustering keys — multi-dimensional data layout.

Partitioning prunes on ONE column hierarchy; sorting clusters on a
prefix. When reads filter on SEVERAL independent columns (date AND
customer AND amount-range), the layout that serves them all is a
space-filling curve: interleave the bits of the columns' normalized
ranks and sort/write by that key — rows close in every dimension land
in the same files, so parquet min/max footer stats skip most files for
any single- or multi-column range predicate. This is the engine form of
Delta/Iceberg's ``OPTIMIZE ZORDER BY`` — here it is just a column
expression plus the existing partitioned/bucketed writers.

Everything is integer bit arithmetic on the JVM (shiftleft/or over
bounded ranks); the only inputs are per-column (lo, hi) bounds —
supply them from table stats, or let ``zorder_key`` run the one tiny
min/max aggregate itself.

Scale notes: ``bits`` per column caps the interleaved key at
``n_cols × bits`` ≤ 63 (one BIGINT). 16 bits/column ≈ 65k rank
buckets — far finer than file granularity, which is what matters:
the curve only needs to order FILES, not rows. Skew in a column
compresses its rank resolution (equi-width buckets); for heavy skew,
pre-transform (log, rank) the column first.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled_rank(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Column value -> integer rank in [0, 2^bits): equi-width bucket of
    the (lo, hi) range, clamped; NULLs rank 0 (sort first, one file)."""
    buckets = (1 << bits) - 1
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("bigint")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * buckets
    )
    return F.coalesce(
        F.greatest(F.lit(0), F.least(F.lit(buckets), scaled)), F.lit(0)
    ).cast("bigint")


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    bounds: Mapping[str, tuple[float, float]] | None = None,
) -> Column:
    """The Morton key for ``cols`` as one BIGINT column expression.

    Bit ``b`` of column ``j``'s rank lands at interleaved position
    ``b * n_cols + j`` — standard Morton interleave, so one curve step
    changes the lowest-order dimension first. ``bounds`` maps column ->
    (lo, hi); missing columns get a min/max aggregate (ONE tiny job for
    all of them).
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} interleaved bits > 63 "
            "(one BIGINT); lower bits"
        )
    bounds = dict(bounds or {})
    missing = [c for c in cols if c not in bounds]
    if missing:
        aggs = []
        for c in missing:
            aggs += [
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            ]
        row = df.agg(*aggs).collect()[0]
        for c in missing:
            lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
            bounds[c] = (lo if lo is not None else 0.0, hi if hi is not None else 0.0)

    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        rank = _scaled_rank(F.col(c), *bounds[c], bits)
        for b in range(bits):
            bit = F.shiftright(rank, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + j))
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    bounds: Mapping[str, tuple[float, float]] | None = None,
    target_file_rows: int | None = None,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Sort by the Morton key and write parquet: every output file covers
    a contiguous curve segment, so its footer min/max stats are TIGHT in
    every z-ordered column and range scans skip non-overlapping files.
    ``repartitionByRange`` on the key gives size-balanced curve segments
    (one exchange — the same price as any clustering write); without
    ``n_files`` the sort is partition-local only — files cluster within
    each existing partition but segments overlap across partitions, so
    pass ``n_files`` whenever the global layout is the point."""
    keyed = df.withColumn("__z", zorder_key(df, cols, bits, bounds))
    if n_files:
        keyed = keyed.repartitionByRange(n_files, "__z")
    writer = keyed.sortWithinPartitions("__z").drop("__z").write.mode(mode)
    if target_file_rows:
        writer = writer.option("maxRecordsPerFile", target_file_rows)
    writer.parquet(path)
