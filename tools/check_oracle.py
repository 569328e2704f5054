#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the raw
tables in <sfDir>, and compares: row count, column names/types, and values
(columns sorted by name, rows sorted by all columns, doubles compared exactly
after float64 cast — mirroring a hash compare).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_tables(con, sf_dir):
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def compare(name, spark_df, duck_df):
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
    if problems:
        return problems
    a, b = canon(spark_df), canon(duck_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype("float64"); bv = bv.astype("float64")
                eq = (av.values == bv.values) | (av.isna().values & bv.isna().values)
            else:
                eq = (av.astype(object).values == bv.astype(object).values) | \
                     (pd.isna(av).values & pd.isna(bv).values)
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(f"col {col}: {int((~eq).sum())} diffs, first row {i}: spark={a[col].iloc[i]!r} duck={b[col].iloc[i]!r}")
        except Exception as e:
            problems.append(f"col {col}: compare error {e}")
    # dtype visibility (schema check analog). An integer-vs-float mismatch is
    # a HARD failure: the driver's hash gate renders the columns differently
    # even when values are numerically equal (the exact class that shipped
    # q_degree_distribution red in r9 — DuckDB windowed SUM(BIGINT) → HUGEINT
    # → float64 in pandas vs Spark int64).
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            ka, kb = a[col].dtype.kind, b[col].dtype.kind
            if ("f" in (ka, kb)) and (ka != kb):
                problems.append(f"DTYPE-FAIL {col}: spark={a[col].dtype} duck={b[col].dtype} (int-vs-float reaches the driver hash gate differently)")
            else:
                problems.append(f"DTYPE-WARN {col}: spark={a[col].dtype} duck={b[col].dtype}")
    return problems

def main():
    # optional 3rd arg: write a judge-readable JSON artifact
    # {query: {"pass": bool, "spark_rows": n, "oracle_rows": n, "problems": [...]}}
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    load_tables(con, sf_dir)
    n_pass = n_fail = 0
    report = {}
    result_dirs = sorted(d for d in os.listdir(out_dir)
                         if os.path.isdir(os.path.join(out_dir, d)))
    for name in result_dirs:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            report[name] = {"pass": False, "spark_rows": 0, "oracle_rows": None,
                            "problems": ["no spark output"]}
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"rows {name}: {len(spark_df)} rows (no oracle — rows-only)")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            report[name] = {"pass": False, "spark_rows": len(spark_df),
                            "oracle_rows": None,
                            "problems": [f"oracle SQL error: {e}"]}
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        problems = compare(name, spark_df, duck_df)
        hard = [p for p in problems if not p.startswith("DTYPE-WARN")]
        report[name] = {"pass": not hard, "spark_rows": len(spark_df),
                        "oracle_rows": len(duck_df), "problems": hard}
        if hard:
            print(f"FAIL {name}: " + "; ".join(problems)); n_fail += 1
        else:
            warn = "; ".join(p for p in problems if p.startswith("DTYPE-WARN"))
            print(f"PASS {name} ({len(spark_df)} rows)" + (f" [{warn}]" if warn else ""))
            n_pass += 1
    missing = sorted(set(oracle) - set(result_dirs))
    for name in missing:
        report[name] = {"pass": False, "spark_rows": 0, "oracle_rows": None,
                        "problems": ["oracle declared but no spark output"]}
        print(f"FAIL {name}: oracle declared but no spark output"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": dict(sorted(report.items()))}, f, indent=1)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
