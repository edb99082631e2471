#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ spark parquet result, runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the fixture
tables, sorts columns by name, and compares row-by-row.
"""
import sys, json, math, glob, os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0
        return v + 0.0
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; ScaleUp fixtures are
        # directories of part files — glob the latter for DuckDB
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sp = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            du = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: exec error {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        sp = sp.reindex(sorted(sp.columns), axis=1)
        du = du.reindex(sorted(du.columns), axis=1)
        if list(sp.columns) != list(du.columns):
            print(f"FAIL {name}: columns spark={list(sp.columns)} duck={list(du.columns)}")
            n_fail += 1
            continue
        if sp.dtypes.tolist() != du.dtypes.tolist():
            print(f"WARN {name}: dtypes spark={sp.dtypes.tolist()} duck={du.dtypes.tolist()}")
        if len(sp) != len(du):
            print(f"FAIL {name}: rows spark={len(sp)} duck={len(du)}")
            n_fail += 1
            continue
        bad = None
        sv, dv = sp.values.tolist(), du.values.tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            na = [norm(x) for x in a]
            nb = [norm(x) for x in b]
            eq = True
            for x, y in zip(na, nb):
                if x is None and y is None:
                    continue
                # NaN floats were normalized to the string "NaN" above,
                # so float compare here is plain equality
                if isinstance(x, float) and isinstance(y, float):
                    if x != y:
                        eq = False
                elif str(x) != str(y):
                    eq = False
            if not eq:
                bad = (i, na, nb)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: first diff row {i}\n  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracle)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
