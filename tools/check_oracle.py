"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
(order-insensitively) values.  Stricter than a hash: exact cell equality
after sorting by all columns.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from flink_rtcef_spark.session import get_spark  # noqa: E402
from flink_rtcef_spark.sources.io import TABLES  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"schema: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    # pandas dtypes must agree exactly: a DuckDB HUGEINT surfacing as
    # float64 against Spark's int64 can defeat value hashing (5.0 vs 5)
    for c in spark_df.columns:
        if str(spark_df[c].dtype) != str(duck_df[c].dtype):
            problems.append(
                f"dtype[{c}]: spark={spark_df[c].dtype} duck={duck_df[c].dtype}"
            )
    if len(spark_df) != len(duck_df):
        problems.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
    s, d = normalize(spark_df), normalize(duck_df)
    if len(s) == len(d):
        for c in s.columns:
            sc, dc = s[c], d[c]
            if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(dc):
                ok = (
                    (sc.isna() & dc.isna())
                    | ((sc - dc).abs() <= 1e-9 + 1e-9 * dc.abs())
                ).all()
            else:
                ok = sc.astype(str).equals(dc.astype(str))
            if not ok:
                diff_idx = None
                try:
                    mism = sc.astype(str) != dc.astype(str)
                    diff_idx = mism.idxmax()
                except Exception:
                    pass
                problems.append(
                    f"values[{c}]: first diff at row {diff_idx}: "
                    f"spark={sc.iloc[diff_idx] if diff_idx is not None else '?'} "
                    f"duck={dc.iloc[diff_idx] if diff_idx is not None else '?'}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"OK   {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
