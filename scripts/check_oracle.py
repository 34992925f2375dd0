#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(with views over the sfDir parquet tables), load the Spark result parquet,
canonicalize both (sort columns by name, sort rows by all columns, round
doubles), and diff. NOT part of the shipped library — a local harness
mirror so oracle mismatches are caught before the driver runs.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
        # normalize ints (duckdb may give int32/uint64/object decimals)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == "object":
            df[c] = df[c].apply(lambda v: float(v) if isinstance(v, (int,)) else v)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want_raw = con.execute(sql).df()
            want = canon(want_raw)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_bad += 1
            continue
        try:
            got_raw = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            got = canon(got_raw)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e)[:200]}")
            n_bad += 1
            continue
        # The driver hashes raw values, so an int64-vs-float64 column is a
        # real mismatch there (e.g. duckdb sum(BIGINT) -> HUGEINT -> float64
        # in pandas) even though canon() blurs it below. Flag it.
        dtype_bad = []
        if list(got.columns) == list(want.columns):
            for c in got.columns:
                gd, wd = str(got_raw[c].dtype), str(want_raw[c].dtype)
                gnum = gd.startswith(("int", "uint", "Int", "float"))
                wnum = wd.startswith(("int", "uint", "Int", "float"))
                if gnum and wnum and gd.startswith("float") != wd.startswith("float"):
                    dtype_bad.append((c, gd, wd))
        if dtype_bad:
            print(f"FAIL {name}: int/float dtype mismatch {dtype_bad} "
                  f"(driver hash would differ; CAST the oracle column)")
            n_bad += 1
        elif list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad_cols = [c for c in got.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"  {c}[{idx}]: spark={got[c][idx]!r} duck={want[c][idx]!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'} "
          f"({len(oracle)} oracled queries)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
