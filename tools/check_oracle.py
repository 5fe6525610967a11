#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage:
  sbt "runMain graft.Verify <sfDir> <outDir>"
  python3 tools/check_oracle.py <sfDir> <outDir>

Loads each Spark result parquet from <outDir>/<name>/, runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same fixture
tables, sorts columns by name and rows by value, and compares exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify timestamp-ish columns to ns precision naive
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: (v is None or v != v, v)) if s.dtype==object else s)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written fixture: a dir of part files
            p = f"{p}/*.parquet"
        if glob.glob(p) or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = normalize(pd.concat([pd.read_parquet(f) for f in files]))
            exp = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        ok = True
        for c in got.columns:
            a, b = got[c].to_numpy(), exp[c].to_numpy()
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                af = a.astype(float); bf = b.astype(float)
                eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
                if not eq.all():
                    d = np.nanmax(np.abs(af - bf))
                    print(f"FAIL {name}: col {c} float mismatch max|d|={d:.3e} ({(~eq).sum()} rows)")
                    ok = False
            else:
                eq = (pd.Series(a).astype(object).where(pd.notna(a), None) ==
                      pd.Series(b).astype(object).where(pd.notna(b), None)) | (pd.isna(a) & pd.isna(b))
                if not eq.all():
                    i = int(np.argmax(~eq.to_numpy()))
                    print(f"FAIL {name}: col {c} mismatch at row {i}: {a[i]!r} vs {b[i]!r} ({(~eq).sum()} rows)")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
