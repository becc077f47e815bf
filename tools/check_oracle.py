#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare row count, column names, and a
row-order-insensitive value hash against the Spark dump from graft.Verify.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(con, rel):
    # sort columns by name, round-trip through csv-ish strings, hash rows
    cols = sorted(rel.columns)
    sel = ", ".join(f'"{c}"' for c in cols)
    rows = con.sql(f"SELECT {sel} FROM rel_t ORDER BY ALL").fetchall()
    def fmt(v):
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)
    import hashlib
    h = hashlib.md5()
    for r in rows:
        h.update(("|".join(fmt(v) for v in r) + "\n").encode())
    return cols, len(rows), h.hexdigest()

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
    failures = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out, name)
        if not glob.glob(spark_dir + "/*.parquet"):
            print(f"{name}: MISSING spark dump")
            failures.append(name)
            continue
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        try:
            orel = con.sql(sql)
            con.register("rel_t", orel)
            ocols, orows, ohash = canon(con, orel)
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            failures.append(name)
            continue
        srel = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        con.register("rel_t", srel)
        scols, srows, shash = canon(con, srel)
        ok = (ocols == scols) and (orows == srows) and (ohash == shash)
        status = "OK" if ok else "MISMATCH"
        print(f"{name}: {status} rows={srows}/{orows} cols_match={ocols==scols} hash_match={ohash==shash}")
        if not ok:
            failures.append(name)
            if ocols != scols:
                print(f"   spark cols:  {scols}\n   oracle cols: {ocols}")
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
