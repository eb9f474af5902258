#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>

For each query dir under <verify_out_dir> (written by graft.Verify), loads the
parquet result, runs the matching SQL from oracle_sql.json in DuckDB over the
sf tables, and compares: columns sorted by name, rows sorted by all columns,
values compared exactly (floats reported with diff if off).

Dev tool only — not part of the graft library.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        res = con.execute(
            f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'")
        scols = [d[0] for d in res.description]
        srows = res.fetchall()
        if name not in oracles:
            n_noracle += 1
            print(f"  ~ {name}: no oracle (rows={len(srows)})")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            n_fail += 1
            print(f"  ✗ {name}: SCHEMA spark={sc} oracle={oc}")
            continue
        if len(sr) != len(orr):
            n_fail += 1
            print(f"  ✗ {name}: ROWS spark={len(sr)} oracle={len(orr)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, orr)):
            for j, (x, y) in enumerate(zip(a, b)):
                if not eq(x, y):
                    bad = (i, sc[j], x, y)
                    break
            if bad:
                break
        if bad:
            n_fail += 1
            print(f"  ✗ {name}: VALUE row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(sr)} rows)")
    print(f"\nPASS {n_pass} / FAIL {n_fail} / NO-ORACLE {n_noracle} of {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
