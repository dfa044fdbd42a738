"""Range (point-in-interval) join without a cartesian product.

Spark has no native range-join optimization (Databricks' range-join hint
is proprietary): a plain ``p.v BETWEEN i.s AND i.e`` join plans as
BroadcastNestedLoop (fine only when one side broadcasts) or a full
cartesian. The scalable pattern is **binning**: both sides map to
coarse bins of width ``bin_width``; an interval explodes to every bin it
overlaps, a point lands in exactly one bin, the join becomes equi on the
bin, and a residual ``BETWEEN`` filter removes same-bin false positives.

Because the point's single bin is always among the interval's exploded
bins, every qualifying pair appears EXACTLY once — no dedup pass.

Cost model at 100 TB: one shuffle per side on the bin key; interval
fan-out = ceil(span / bin_width) + 1, so ``bin_width`` trades shuffle
volume (small bins → more interval copies) against residual-filter
selectivity (big bins → more false-positive pairs). Pick bin_width near
the median interval span; AQE's skew split handles hot bins (a bin
covering a popular value range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col <= end_col`` (inclusive ends), via bin
    bucketing — one equi-join shuffle instead of a nested loop.

    Columns from both inputs are preserved (disambiguate beforehand if
    names collide). ``how`` supports ``inner`` (matching pairs) and
    ``left`` (points kept even when no interval matches — implemented as
    the inner join unioned with the anti side, so the equi-join path is
    reused rather than falling back to an inequality join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if bin_width <= 0:
        # floor(v/0) is NULL and sequence(hi, lo) reverses — either would
        # silently yield empty/all-null output instead of an error
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    p_bin = F.floor(F.col(point_col) / F.lit(bin_width))
    p = points.withColumn("__bin", p_bin.cast("bigint"))
    spread = F.sequence(
        F.floor(F.col(start_col) / F.lit(bin_width)).cast("bigint"),
        F.floor(F.col(end_col) / F.lit(bin_width)).cast("bigint"),
    )
    i = intervals.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        "__bin", F.explode(spread)
    )
    matched = (
        p.join(i, "__bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bin")
    )
    if how == "inner":
        return matched
    # null-safe anti-join: plain column equality would fail to anti-match
    # a matched point row carrying a NULL in any non-join column, emitting
    # it twice (matched + null-extended) — not LEFT JOIN semantics
    import functools

    pa = p.drop("__bin").alias("__p")
    ma = matched.select(*points.columns).alias("__m")
    cond = functools.reduce(
        lambda x, y: x & y,
        [F.col(f"__p.{c}").eqNullSafe(F.col(f"__m.{c}")) for c in points.columns],
    )
    unmatched = pa.join(ma, cond, "left_anti")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(unmatched)
