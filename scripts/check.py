#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Compares each Spark result parquet (written by graft.Verify) against the
DuckDB result of the corresponding oracle SQL, with columns sorted by name
and rows sorted by all columns — the same shape the driver hashes.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [--json out.json] [query ...]
Extra args restrict the compare to those query names (matches graft.Verify's
optional filter for the fast local loop); the driver always checks all.
--json writes a driver-shaped per-query artifact (rows/schema/hash match
flags + row counts), so an off-gate sweep (e.g. sf0.1) can be committed as
auditable evidence rather than prose.
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


def main(outdir, sfdir, only=(), json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = 0
    fails = []
    report = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            # fetchall() BEFORE any further con.execute(): duckdb-python
            # invalidates the pending result when the connection runs the
            # next statement.
            sp = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
            sp_types = [str(t) for t in con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet' LIMIT 0"
            ).arrow().schema.types]
            du = con.execute(sql)
            du_cols = [d[0] for d in du.description]
            du_rows = du.fetchall()
            du_types = [str(t) for t in con.execute(
                f"SELECT * FROM ({sql}) q LIMIT 0").arrow().schema.types]
        except Exception as e:
            fails.append((name, f"ERROR {e}"))
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": str(e)[:500]}
            continue
        c1, r1 = canon(sp_rows, sp_cols)
        c2, r2 = canon(du_rows, du_cols)
        # The driver hashes typed (arrow) values, so an oracle whose SUM
        # stays HUGEINT mismatches a BIGINT parquet column even when every
        # value is equal. Compare dtypes here so that fails locally first.
        # Integer WIDTH differences (int32 row_number vs BIGINT) are
        # normalized away — the driver's r4 capture hash-matched those —
        # but hugeint/decimal/float-vs-int divergence stays fatal.
        def norm(t):
            return "int" if t in ("int8", "int16", "int32", "int64") else t
        t1 = [norm(t) for _, t in sorted(zip(sp_cols, sp_types))]
        t2 = [norm(t) for _, t in sorted(zip(du_cols, du_types))]
        schema_ok = c1 == c2 and t1 == t2
        rows_ok = len(r1) == len(r2)
        hash_ok = r1 == r2
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": hash_ok, "spark_rows": len(r1),
                        "oracle_rows": len(r2), "err": None}
        if c1 != c2:
            fails.append((name, f"schema mismatch spark={c1} duck={c2}"))
        elif t1 != t2:
            fails.append((name, "dtype mismatch "
                          + ", ".join(f"{c}: spark={a} duck={b}"
                                      for c, a, b in zip(c1, t1, t2)
                                      if a != b)))
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
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if fails else 0


if __name__ == "__main__":
    args = sys.argv[3:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check.py <outDir> <sfDir> [query...] [--json <path>]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sys.exit(main(sys.argv[1], sys.argv[2], set(args), json_out))
