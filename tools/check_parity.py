"""Local parity harness: run every declared query on Spark AND DuckDB,
compare row count, schema width, and exact values (stricter than the
driver's order-insensitive hash). Usage:

    python tools/check_parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from knightshift_spark.queries import load_all  # noqa: E402
from knightshift_spark.session import get_spark  # noqa: E402
from knightshift_spark.tables import TABLE_NAMES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else v)
    df = df.sort_values(by=list(df.columns), na_position="first", kind="mergesort")
    return df.reset_index(drop=True)


def compare(name: str, s: pd.DataFrame, d: pd.DataFrame) -> list[str]:
    problems = []
    if len(s) != len(d):
        problems.append(f"rowcount spark={len(s)} duckdb={len(d)}")
    sc, dc = sorted(map(str.lower, s.columns)), sorted(map(str.lower, d.columns))
    if sc != dc:
        problems.append(f"columns spark={sc} duckdb={dc}")
    if problems:
        return problems
    s, d = canon(s), canon(d)
    d.columns = s.columns
    for c in s.columns:
        sv, dv = s[c], d[c]
        # Driver parity hashes the *rendered* values, so an oracle column
        # that pandas-converts to float while Spark stays integral (e.g. a
        # DuckDB HUGEINT SUM) breaks the hash even when every value is
        # numerically identical. Fail loudly on that drift here.
        if {sv.dtype.kind, dv.dtype.kind} == {"i", "f"} or {
            sv.dtype.kind,
            dv.dtype.kind,
        } == {"u", "f"}:
            problems.append(
                f"col {c}: integral-vs-float dtype drift spark={sv.dtype} "
                f"duckdb={dv.dtype} (CAST the oracle column; the driver hash "
                "renders 0 and 0.0 differently)"
            )
        try:
            if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                eq = (sv.fillna(-1e308) - dv.fillna(-1e308)).abs() < 1e-12
            else:
                eq = sv.astype(object).where(pd.notna(sv), None).eq(
                    dv.astype(object).where(pd.notna(dv), None)
                ) | (pd.isna(sv) & pd.isna(dv))
        except Exception as e:  # dtype clash etc.
            problems.append(f"col {c}: compare error {e}")
            continue
        bad = (~eq).sum()
        if bad:
            idx = (~eq).idxmax()
            problems.append(
                f"col {c}: {bad} mismatches, first at row {idx}: "
                f"spark={sv.iloc[idx]!r} duckdb={dv.iloc[idx]!r}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = load_all()
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.spark_fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        t1 = time.time()
        if spec.oracle is None:
            print(f"ok-   {name}: rows={len(sdf)} (no oracle) spark={t1-t0:.2f}s")
            continue
        try:
            ddf = con.execute(spec.oracle).fetch_arrow_table().to_pandas(
                date_as_object=True
            )
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        t2 = time.time()
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(
                f"ok    {name}: rows={len(sdf)} spark={t1-t0:.2f}s duckdb={t2-t1:.2f}s"
            )
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
