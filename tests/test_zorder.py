"""Z-order layout: Morton key correctness + measured file-skipping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knightshift_spark.plans.zorder import zorder_key, zorder_write


def _morton(xr: int, yr: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((xr >> b) & 1) << (2 * b)
        out |= ((yr >> b) & 1) << (2 * b + 1)
    return out


def test_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y",
            zorder_key(df, ["x", "y"], bits=3, bounds={"x": (0, 7), "y": (0, 7)}).alias("z"),
        ).collect()
    }
    for (x, y), z in got.items():
        # bounds (0,7) over 3 bits: rank == value exactly
        assert z == _morton(x, y, 3), (x, y, z)


def test_curve_locality_beats_linear_sort_on_second_column(spark):
    """The point of the curve: after z-ordering on (x, y), a range
    filter on y touches FEWER files than a layout sorted by x alone —
    and a filter on x still prunes. Measured via which files actually
    contribute rows (parquet footer pruning follows the same min/max)."""
    import shutil

    n = 20_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 141).alias("x"),
            ((F.col("id") * 7919) % 143).alias("y"),
            F.col("id").alias("payload"),
        )
    )
    zdir, ldir = "/tmp/ks-ztest/z", "/tmp/ks-ztest/linear"
    shutil.rmtree("/tmp/ks-ztest", ignore_errors=True)
    zorder_write(
        df, zdir, ["x", "y"], bits=8,
        bounds={"x": (0, 140), "y": (0, 142)},
        n_files=16, target_file_rows=2000,
    )
    (
        df.repartitionByRange(16, "x").sortWithinPartitions("x")
        .write.option("maxRecordsPerFile", 2000).parquet(ldir)
    )

    def files_touched(path, cond):
        return (
            spark.read.parquet(path).filter(cond)
            .select(F.input_file_name().alias("f")).distinct().count()
        )

    def total_files(path):
        return spark.read.parquet(path).select(F.input_file_name()).distinct().count()

    y_cond = (F.col("y") >= 10) & (F.col("y") < 20)
    x_cond = (F.col("x") >= 10) & (F.col("x") < 20)
    z_total, l_total = total_files(zdir), total_files(ldir)
    zy, ly = files_touched(zdir, y_cond), files_touched(ldir, y_cond)
    zx = files_touched(zdir, x_cond)
    # linear-by-x layout scatters y across every file; the curve keeps y
    # ranges in a minority of files
    assert ly == l_total
    assert zy < z_total * 0.7, (zy, z_total)
    # and x-range locality survives interleaving
    assert zx < z_total * 0.7, (zx, z_total)
    # same data either way
    assert (
        spark.read.parquet(zdir).count()
        == spark.read.parquet(ldir).count()
        == n
    )


def test_auto_bounds_and_null_handling(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "a int, b double"
    )
    out = df.select(zorder_key(df, ["a", "b"], bits=4).alias("z")).collect()
    assert all(r["z"] is not None for r in out)  # NULLs rank 0, key stays set


def test_rejects_too_many_bits(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int")
    with pytest.raises(ValueError, match="> 63"):
        zorder_key(df, ["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
