#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Compares each Spark result parquet (written by graft.Verify) against the
DuckDB result of the corresponding oracle SQL, with columns sorted by name
and rows sorted by all columns — the same shape the driver hashes.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            rr.append(repr(v))
        out.append("|".join(rr))
    out.sort()
    return [cols[i] for i in order], out


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    fails = []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            sp = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [d[0] for d in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            fails.append((name, f"ERROR {e}"))
            continue
        c1, r1 = canon(sp_rows, sp_cols)
        c2, r2 = canon(du_rows, du_cols)
        if c1 != c2:
            fails.append((name, f"schema mismatch spark={c1} duck={c2}"))
        elif len(r1) != len(r2):
            fails.append((name, f"rowcount spark={len(r1)} duck={len(r2)}"))
        elif r1 != r2:
            diff = next(i for i in range(len(r1)) if r1[i] != r2[i])
            fails.append((name, f"values differ at sorted row {diff}:\n"
                          f"  spark: {r1[diff][:300]}\n  duck : {r2[diff][:300]}"))
        else:
            n_ok += 1
            print(f"OK    {name} ({len(r1)} rows)")
    for name, msg in fails:
        print(f"FAIL  {name}: {msg}")
    print(f"\n{n_ok}/{len(oracle)} pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
