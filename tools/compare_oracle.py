#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB against views
over the sfDir tables, then compare row count, schema (column names),
and a hash over column-name-sorted, row-sorted values.
"""
import sys, json, glob, os
import duckdb

TABLES = ["lineitem", "orders", "customer", "supplier", "part",
          "nation", "region", "events", "documents", "embeddings"]


def canon(rows, cols):
    # sort columns by name, then rows lexicographically (stringified)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(repr(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for q in qdirs:
        files = glob.glob(os.path.join(out_dir, q, "*.parquet"))
        if not files:
            print(f"FAIL  {q}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{files[0]}'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if q not in oracle:
            status = "ROWS " if grows else "EMPTY"
            if not grows: n_fail += 1
            else: n_rowsonly += 1
            print(f"{status} {q}: rows-only check, {len(grows)} rows")
            continue
        try:
            exp = con.execute(oracle[q])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL  {q}: oracle SQL error: {e}"); n_fail += 1; continue
        problems = []
        if sorted(gcols) != sorted(ecols):
            problems.append(f"schema {sorted(gcols)} != {sorted(ecols)}")
        if len(grows) != len(erows):
            problems.append(f"rowcount {len(grows)} != {len(erows)}")
        if not problems:
            cg, ce = canon(grows, gcols), canon(erows, ecols)
            if cg != ce:
                diffs = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:3]
                problems.append("values differ, first diffs: " + "; ".join(
                    f"spark={cg[i]} duck={ce[i]}" for i in diffs))
        if problems:
            print(f"FAIL  {q}: " + " | ".join(problems)); n_fail += 1
        else:
            print(f"PASS  {q}: {len(grows)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
