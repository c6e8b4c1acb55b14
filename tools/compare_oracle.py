#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the oracle SQL in DuckDB over
views named after the parquet tables in sfDir, and compares to the Spark
parquet output: columns sorted by name, rows sorted, values compared cell
by cell. Prints PASS/FAIL per query.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        o = oracle.reindex(sorted(oracle.columns), axis=1)
        s = spark.reindex(sorted(spark.columns), axis=1)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns differ oracle={list(o.columns)} spark={list(s.columns)}")
            n_fail += 1
            continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows differ oracle={len(o)} spark={len(s)}")
            n_fail += 1
            continue
        o = o.sort_values(by=list(o.columns), ignore_index=True)
        s = s.sort_values(by=list(s.columns), ignore_index=True)
        mismatches = []
        for c in o.columns:
            ov, sv = o[c], s[c]
            neq = ~((ov == sv) | (ov.isna() & sv.isna()))
            if neq.any():
                i = int(neq.idxmax())
                mismatches.append((c, i, ov[i], sv[i], int(neq.sum())))
        if mismatches:
            c, i, a, b, n = mismatches[0]
            print(f"FAIL {name}: {len(mismatches)} col(s) differ; first: col={c} row={i} oracle={a!r} spark={b!r} ({n} cells)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    import os
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if os.path.isdir(path) and name not in oracles:
            try:
                n = con.execute(f"SELECT count(*) FROM '{path}/*.parquet'").fetchone()[0]
                print(f"ROWS {name}: {n} rows (no oracle)")
            except Exception as e:
                print(f"FAIL {name}: unreadable: {str(e).splitlines()[0]}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
