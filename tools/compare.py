#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate (dev tool only; the
shipped library is pure Scala). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out

For each query: runs the oracle SQL in DuckDB over views named after the
parquet tables, loads the Spark parquet result, sorts columns by name and
rows by all columns, and compares cell-by-cell (exact).
"""
import json, sys, glob, os
import duckdb

def norm(con, rel_sql, label):
    df = con.execute(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            got = norm(con, f"SELECT * FROM read_parquet('{spark_glob}')", "spark")
            want = norm(con, oracle[name], "oracle")
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1; continue
        if not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first diffs:")
            print(got[bad].head(3)); print(want[bad].head(3))
            failures += 1; continue
        print(f"OK   {name}: {len(got)} rows")
    extra = [os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
             if os.path.isdir(d) and os.path.basename(d) not in oracle]
    if extra:
        print(f"note: rows-only (no oracle): {sorted(extra)}")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
