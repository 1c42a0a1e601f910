"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at the given sf dir, runs the
matching oracle_sql() through DuckDB on the same parquet views, and
compares row count, column names, and order-insensitive values (columns
sorted by name, rows sorted by all columns). Exit 1 on any mismatch.

Usage: PYTHONPATH=/root/repo python scripts/check_entry.py [sf_dir] [only_query...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str | None:
    if len(spark_pdf) != len(duck_pdf):
        return f"row count {len(spark_pdf)} != {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = np.allclose(av.fillna(-1e308), bv.fillna(-1e308), rtol=0, atol=0)
        else:
            ok = av.fillna("\0NULL").equals(bv.fillna("\0NULL")) if av.dtype == object else av.fillna(-(2**62)).equals(bv.fillna(-(2**62)))
        if not ok:
            diff = (av != bv) & ~(av.isna() & bv.isna())
            i = diff.idxmax()
            return f"values differ in col {c}: e.g. row {i}: {av[i]!r} != {bv[i]!r}"
    return None


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--driver-like"]
    driver_like = "--driver-like" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    if driver_like:
        # adversarial stand-in for the driver's own session: ANSI on,
        # non-UTC timezone, default shuffle partitions — queries must
        # still match the oracle under a session we don't control
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_entry_driverlike")
            .config("spark.sql.ansi.enabled", "true")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        from fluent_server_spark.session import get_spark

        spark = get_spark("check_entry", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        err = compare(sdf, ddf)
        if err:
            failures.append((name, err))
            print(f"FAIL  {name}: {err} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    # smoke the flagship
    n = E.entry(spark).count()
    print(f"entry() rows: {n}")
    if failures:
        print(f"\n{len(failures)} FAILURES")
        return 1
    print("\nall queries match oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
