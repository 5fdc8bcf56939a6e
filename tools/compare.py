#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py /tmp/vout /root/testdata/sf0.01

For each query dir under outDir: read the Spark result parquet, run the
oracle SQL from oracle_sql.json against views over the sf tables, sort
columns by name and rows by all values, and diff cell-by-cell.
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def key(row):
    return tuple((x is None, str(x)) for x in row)

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            gcols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(gcols)} FROM got_t").fetchall() if False else \
                got.project(", ".join(gcols)).fetchall()
            want = con.sql(sql)
            wcols = sorted(want.columns)
            want_rows = want.project(", ".join(wcols)).fetchall()
            if gcols != wcols:
                print(f"FAIL {name}: columns {gcols} != {wcols}")
                n_fail += 1
                continue
            if len(got_rows) != len(want_rows):
                print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}")
                n_fail += 1
                continue
            g = sorted([tuple(norm(v) for v in r) for r in got_rows], key=key)
            w = sorted([tuple(norm(v) for v in r) for r in want_rows], key=key)
            bad = [(a, b) for a, b in zip(g, w) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)} mismatched rows; first: got={bad[0][0]} want={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got_rows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
