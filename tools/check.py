#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output of
SparkEntry.queries[name]) and compares it to the DuckDB result of
oracle_sql.json[name] over the same corpus: column names sorted,
rows sorted, exact value compare (with dtype report).
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # optional subset: comma-separated names
        keep = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got, exp = norm(got), norm(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        mism = []
        for c in got.columns:
            a, b = got[c], exp[c]
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                mism.append(f"{c}[{idx}]: spark={a[idx]!r} duck={b[idx]!r} ({(~eq).sum()} cells)")
        if mism:
            print(f"FAIL {name}: " + "; ".join(mism)); n_fail += 1
        else:
            dt = {c: (str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
                  if str(got[c].dtype) != str(exp[c].dtype)}
            note = f" [dtype diff: {dt}]" if dt else ""
            print(f"PASS {name} ({len(got)} rows){note}"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
