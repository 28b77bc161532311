#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
over views on <sfDir>/*.parquet, read the Spark parquet result, compare
schema (column names sorted), row count, and exact values.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        exp, got = canon(exp), canon(got)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            if e.dtype.kind == "f" or g.dtype.kind == "f":
                ef, gf = e.astype(float), g.astype(float)
                eq = (ef.values == gf.values) | (ef.isna().values & gf.isna().values)
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[{i}]: exp={ef.iloc[i]!r} got={gf.iloc[i]!r}")
            else:
                es, gs = e.astype(str), g.astype(str)
                if not (es.values == gs.values).all():
                    i = int(np.argmin(es.values == gs.values))
                    bad.append(f"{c}[{i}]: exp={es.iloc[i]!r} got={gs.iloc[i]!r} "
                               f"(dtypes {e.dtype}/{g.dtype})")
        if bad:
            print(f"FAIL {name}: {len(bad)} col diffs; first: {bad[0]}")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(exp)} rows x {len(exp.columns)} cols")
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'} / {len(oracle)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
