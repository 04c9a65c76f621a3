#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump produced by `graft.Verify`,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name (like the driver), and compares
shape + values row by row. Dev-only tooling — not part of the library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ours = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            theirs = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:300]}")
            n_fail += 1
            continue
        oc = sorted(ours.column_names)
        tc = sorted(theirs.column_names)
        if oc != tc:
            print(f"FAIL {name}: columns ours={oc} oracle={tc}")
            n_fail += 1
            continue
        tmis = [(c, str(ours.column(c).type), str(theirs.column(c).type))
                for c in oc
                if str(ours.column(c).type) != str(theirs.column(c).type)]
        if tmis:
            print(f"TYPE {name}: {tmis}")
        if ours.num_rows != theirs.num_rows:
            print(f"FAIL {name}: rows ours={ours.num_rows} "
                  f"oracle={theirs.num_rows}")
            n_fail += 1
            continue
        odata = [ours.column(c).to_pylist() for c in oc]
        tdata = [theirs.column(c).to_pylist() for c in tc]
        bad = None
        for ci, c in enumerate(oc):
            for ri in range(ours.num_rows):
                a, b = odata[ci][ri], tdata[ci][ri]
                if norm(a) != norm(b):
                    bad = (c, ri, a, b)
                    break
            if bad:
                break
        if bad:
            c, ri, a, b = bad
            print(f"FAIL {name}: col={c} row={ri} ours={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({ours.num_rows} rows)")
            n_pass += 1
    no_oracle = []
    import os
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle:
            no_oracle.append(d)
    print(f"\n{n_pass} pass / {n_fail} fail; rows-only (no oracle): "
          f"{no_oracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
