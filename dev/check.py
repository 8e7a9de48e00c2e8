#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate.

Usage: dev/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<query> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the fixture
tables in <sfDir>, and compares: column name sets, row counts, and
cell-exact values (columns sorted by name, row order as produced).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # duckdb hugeint / decimal → float-safe compare via object
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if os.path.isdir(p):  # Spark-written dataset (ScaleGen output)
            p = os.path.join(p, "*.parquet")
        src = f"read_parquet('{p}')"
        if t == "events":
            # ScaleGen writes ts as raw int64 nanos (no logical type);
            # mirror Tables.events' ns→µs truncation so the oracle SQL's
            # CAST(ts AS TIMESTAMP) sees a timestamp either way
            (ty,) = con.execute(
                f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()
            if ty == "BIGINT":
                src = f"(SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM {src})"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sys.argv[3:] or sorted(oracle)
    n_pass = n_fail = 0
    for name in names:
        sdf = load_spark(outdir, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(sdf)})"); continue
        try:
            ddf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s, d = norm(sdf), norm(ddf)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"); n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        bad = []
        for c in s.columns:
            a, b = s[c], d[c]
            try:
                if str(a.dtype) == "float64" or str(b.dtype) == "float64":
                    a2, b2 = a.astype("float64"), b.astype("float64")
                    neq = ~((a2 == b2) | (a2.isna() & b2.isna()))
                else:
                    neq = ~((a == b) | (a.isna() & b.isna()))
            except Exception:
                neq = pd.Series([x != y and not (pd.isna(x) and pd.isna(y)) for x, y in zip(a.tolist(), b.tolist())])
            if neq.any():
                i = int(neq.idxmax())
                bad.append(f"{c}: {int(neq.sum())} cells differ, first@{i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
        if bad:
            print(f"FAIL {name}: " + " | ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows, {len(s.columns)} cols)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
