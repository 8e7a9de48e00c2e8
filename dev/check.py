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

def castscan(sfdirs):
    """Fixture sweep for the double→DECIMAL knife-edge (VERDICT r6 item 5).

    For every double column an oracled query has ever quantized
    (events.value historically; l_extendedprice/l_quantity/acctbals as a
    margin), compare THIS DuckDB build's CAST(x AS DECIMAL(18,2)) cents
    against Java/Spark's BigDecimal.valueOf(x).setScale(2, HALF_UP) rule
    (reproduced exactly here: round-half-up on the SHORTEST decimal repr,
    which is what BigDecimal.valueOf uses). Any disagreement is a value on
    which a decimal-cast query would go driver-red even when the local
    gate is green — the r4–r6 q_outlier_mad failure class. Fixtures
    regenerate between rounds, so run this every round.
    """
    import decimal
    cols = [("events", "value"), ("lineitem", "l_extendedprice"),
            ("lineitem", "l_quantity"), ("customer", "c_acctbal"),
            ("supplier", "s_acctbal"), ("orders", "o_totalprice"),
            ("part", "p_retailprice")]
    total_bad = 0
    for sfdir in sfdirs:
        for tbl, col in cols:
            p = os.path.join(sfdir, f"{tbl}.parquet")
            if not os.path.exists(p):
                continue
            if os.path.isdir(p):
                p = os.path.join(p, "*.parquet")
            # scale 2 = the retired q_outlier_mad cents cast; scale 6 = the
            # DECIMAL(24,6) quantum every dsum() ingestion cast uses
            rows = duckdb.sql(
                f"SELECT DISTINCT {col} AS v, "
                f"CAST(CAST({col} AS DECIMAL(18,2)) * 100 AS BIGINT), "
                f"CAST(CAST({col} AS DECIMAL(24,6)) * 1000000 AS BIGINT) "
                f"FROM read_parquet('{p}') WHERE {col} IS NOT NULL").fetchall()
            bad = []
            for v, duck2, duck6 in rows:
                # BigDecimal.valueOf(double) = Double.toString shortest repr;
                # repr(float) in py3 is the same shortest round-trip decimal
                dv = decimal.Decimal(repr(v))
                java2 = int(dv.scaleb(2).to_integral_value(rounding=decimal.ROUND_HALF_UP))
                java6 = int(dv.scaleb(6).to_integral_value(rounding=decimal.ROUND_HALF_UP))
                if java2 != duck2 or java6 != duck6:
                    bad.append((v, duck2, java2, duck6, java6))
            tag = f"{sfdir} {tbl}.{col}"
            if bad:
                total_bad += len(bad)
                print(f"CASTSCAN DISAGREE {tag}: {len(bad)}/{len(rows)} values")
                for v, d2, j2, d6, j6 in bad[:5]:
                    print(f"  value={v!r} scale2 duck={d2} java={j2} | scale6 duck={d6} java={j6}")
            else:
                print(f"CASTSCAN OK {tag}: {len(rows)} distinct values agree (scales 2 and 6)")
    print(f"== castscan: {total_bad} disagreeing values ==")
    print("(disagreements mean: never CAST this column to DECIMAL inside an"
          " oracled query — this DuckDB build and Spark's HALF_UP differ;"
          " the driver's build can differ even when this one agrees)")
    sys.exit(1 if total_bad else 0)

def main():
    if sys.argv[1] == "--castscan":
        castscan(sys.argv[2:] or sorted(glob.glob("/root/testdata/sf*")))
        return
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
        # Dtype gate (round 8): the driver's hash distinguishes 123 from
        # 123.0. DuckDB SUM(int) returns HUGEINT, which pandas renders as
        # float64 — an oracle column that comes back float while Spark
        # writes int64 hash-mismatches driver-side even when every value
        # is equal (this, not arithmetic, was the r4–r7 q_outlier_mad and
        # r7 q_kaplan_meier red). CAST such columns to BIGINT in the SQL.
        leaks = []
        for c in s.columns:
            sk, dk = str(s[c].dtype), str(d[c].dtype)
            s_int = sk.startswith("int") or sk.startswith("uint")
            d_int = dk.startswith("int") or dk.startswith("uint")
            s_f = sk.startswith("float")
            d_f = dk.startswith("float")
            if (s_int and d_f) or (s_f and d_int) or dk == "object" and (s_int or s_f):
                leaks.append(f"{c}: spark={sk} duck={dk}")
        if leaks:
            print(f"FAIL {name}: dtype leak (driver hash breaks on int-vs-float even with equal values): " + "; ".join(leaks)); n_fail += 1; continue
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
