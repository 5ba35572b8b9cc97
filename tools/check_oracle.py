#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB (tables registered as
views over <sfDir>/*.parquet), and compares row count, column names and
values (exact; rows sorted by all columns).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, math
import duckdb

def norm_cell(v):
    if isinstance(v, float):
        return v  # exact compare; engines are designed to agree bitwise
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(got_cols)} FROM '{res_dir}/*.parquet' ORDER BY ALL"
            ).fetchall()
        except Exception as e:
            print(f"FAIL {name}: reading spark output: {e}"); n_fail += 1; continue
        try:
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rows = con.sql(
                f"SELECT {', '.join(want_cols)} FROM ({sql}) ORDER BY ALL"
            ).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}"); n_fail += 1; continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}"); n_fail += 1; continue
        bad = None
        for i, (g, w) in enumerate(zip(got_rows, want_rows)):
            g2 = tuple(norm_cell(x) for x in g); w2 = tuple(norm_cell(x) for x in w)
            if g2 != w2:
                bad = (i, g2, w2); break
        if bad:
            i, g2, w2 = bad
            # show float deltas to distinguish bitwise drift from real bugs
            print(f"FAIL {name}: row {i} differs\n  spark={g2}\n  duck ={w2}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
