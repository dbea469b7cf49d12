#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the Verify
output dir (spark result parquet per query + oracle_sql.json), runs each
oracle in DuckDB over the same sf dir, and compares values exactly.

Usage: selfcheck.py <sfDir> <verifyOutDir> [queryName...]
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    err_path = os.path.join(out_dir, "_errors.json")
    verify_errors = {}
    if os.path.exists(err_path):
        verify_errors = json.load(open(err_path))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if name in verify_errors:
            print(f"FAIL {name}: verify error: {verify_errors[name][:300]}")
            n_fail += 1; continue
        pq_dir = os.path.join(out_dir, name)
        if not os.path.isdir(pq_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = canon(con.execute(
                f"SELECT * FROM read_parquet('{pq_dir}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1; continue
        try:
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1; continue
        ok = True; why = ""
        if list(spark_df.columns) != list(duck_df.columns):
            ok, why = False, (f"columns differ: spark={list(spark_df.columns)}"
                              f" duck={list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            ok, why = False, f"rows: spark={len(spark_df)} duck={len(duck_df)}"
        else:
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                try:
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        eq = ((a.isna() & b.isna()) |
                              (a == b)).all()
                    else:
                        eq = a.astype(object).where(pd.notna(a), None) \
                            .equals(b.astype(object).where(pd.notna(b), None))
                except Exception as e:
                    eq = False; why = f"compare error col {c}: {e}"
                if not eq:
                    ok = False
                    if not why:
                        mism = None
                        try:
                            m = (a != b) & ~(a.isna() & b.isna())
                            idx = m[m].index[:3].tolist()
                            mism = [(i, a[i], b[i]) for i in idx]
                        except Exception:
                            pass
                        why = f"col {c} differs: {mism}"
                    break
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: {why}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
