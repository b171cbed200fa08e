#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Reads the Verify.scala output directory (one parquet dir per query +
oracle_sql.json), runs each oracle SQL in DuckDB over the same sf tables,
and compares row count, column names, and a value hash with columns sorted
by name and rows sorted canonically. Dev-only tool (driver-side python is
available in this container); NOT part of the shipped Scala library.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import hashlib

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: timestamps -> iso strings, floats -> repr via float64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.tolist() if hasattr(v, "tolist") else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        ignore_index=True)
    return df

def h(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset (GenScale dirs)
            p = f"{p}/*.parquet"
        if glob.glob(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        if name not in oracles:
            print(f"....  {name}: rows={len(got)} (no oracle, rows-only)")
            n_noracle += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1
        elif h(g) != h(w):
            print(f"FAIL {name}: value hash mismatch")
            diff = (g.astype(str) != w.astype(str))
            idx = diff.any(axis=1)
            print("  spark:", g[idx].head(3).to_dict("records"))
            print("  duck :", w[idx].head(3).to_dict("records"))
            n_fail += 1
        else:
            # dtype parity warning: this mirror's %.10g formatting hides
            # int64-vs-float64 divergence (e.g. DuckDB HUGEINT sums
            # arriving as float64) that the driver's comparator may NOT
            # hide — the p_cms round-7 failure mode. Warn even on PASS.
            dt = {c: (str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns
                  if c in want.columns
                  and str(got[c].dtype) != str(want[c].dtype)}
            tag = f"  [DTYPE WARN {dt}]" if dt else ""
            print(f"PASS {name} ({len(g)} rows){tag}"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
