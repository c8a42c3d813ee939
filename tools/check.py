#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet,
and compares: column names (sorted), row count, and exact cell values after
sorting rows by all columns.  Reports per-query PASS/FAIL with diffs.
"""
import json, os, sys
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware → naive UTC (spark writes instant-semantics parquet)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        x, y = a[c].values, b[c].values
        if np.issubdtype(np.asarray(x).dtype, np.floating) or np.issubdtype(np.asarray(y).dtype, np.floating):
            xf = pd.to_numeric(a[c], errors="coerce").values.astype(float)
            yf = pd.to_numeric(b[c], errors="coerce").values.astype(float)
            same_nan = np.isnan(xf) == np.isnan(yf)
            if not same_nan.all():
                return False
            m = ~np.isnan(xf)
            if not (xf[m] == yf[m]).all():
                return False
        else:
            if not (pd.Series(x).astype(str).values == pd.Series(y).astype(str).values).all():
                return False
    return True

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        got = canon(pd.read_parquet(os.path.join(out_dir, name)))
        if name not in oracles:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            n_rowsonly += 1
            print(f"[{status:>9}] {name}: rows={len(got)}")
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"[ ORACLE-ERR] {name}: {e}")
            n_fail += 1
            continue
        ok_cols = list(got.columns) == list(exp.columns)
        ok_rows = len(got) == len(exp)
        ok_vals = ok_cols and ok_rows and cells_equal(got, exp)
        if ok_cols and ok_rows and ok_vals:
            n_pass += 1
            print(f"[      PASS] {name}: rows={len(got)}")
        else:
            n_fail += 1
            print(f"[      FAIL] {name}: cols_ok={ok_cols} rows {len(got)} vs {len(exp)}")
            if not ok_cols:
                print(f"   spark cols: {list(got.columns)}\n   duck  cols: {list(exp.columns)}")
            elif ok_rows:
                for c in got.columns:
                    ga, ea = got[c].values, exp[c].values
                    try:
                        neq = ~(pd.Series(ga).astype(str).values == pd.Series(ea).astype(str).values)
                    except Exception:
                        neq = np.ones(len(got), bool)
                    if neq.any():
                        i = int(np.argmax(neq))
                        print(f"   col {c}: first diff at row {i}: spark={ga[i]!r} duck={ea[i]!r} ({int(neq.sum())} diffs)")
            else:
                print(f"   spark head:\n{got.head(3)}\n   duck head:\n{exp.head(3)}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only, {len(names)} total ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
