#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify at a given SF (expects it was already run by caller or
runs it via sbt), then executes every oracle_sql.json query in DuckDB over
the same parquet tables and compares row count, column names, and values.

Usage: python3 tools/check.py <sfDir> <outDir>
(outDir = directory Verify wrote: <name>/ parquet dirs + oracle_sql.json)
"""
import sys, json, glob, math, os
import duckdb

def canon(rows, cols):
    # sort columns by name (driver behavior), stringify values, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # multi-file fixture shape (tools/mkmultifile.py)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            # con.sql relations: distinct result objects (con.execute returns
            # the connection itself, which aliased got/exp before) and .types
            # reports REAL DuckDB types (BIGINT vs HUGEINT), not the DB-API
            # category codes that collapse all ints to 'NUMBER'.
            grel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            gcols = list(grel.columns)
            gtypes = {c: str(t) for c, t in zip(grel.columns, grel.types)}
            grows = grel.fetchall()
            erel = con.sql(sql)
            ecols = list(erel.columns)
            etypes = {c: str(t) for c, t in zip(erel.columns, erel.types)}
            erows = erel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_fail += 1
            continue
        # dtype parity: the driver's hasher stringifies values after a
        # pandas round-trip, so int widths <= 64 bit are interchangeable
        # (int32 and int64 stringify identically — r03 driver-green with
        # INTEGER-vs-BIGINT diffs). What DOES break the driver is HUGEINT
        # (arrow decimal128 -> float/Decimal, the round-2 hash-fail class)
        # and DECIMAL scales (can stringify as 0E-7) — keep those distinct.
        def tnorm(t):
            return "INT" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else t
        tdiff = {c: (gtypes[c], etypes[c]) for c in gtypes
                 if tnorm(gtypes[c]) != tnorm(etypes[c])}
        if tdiff:
            print(f"FAIL {name}: dtype mismatch spark-vs-oracle {tdiff}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(erows)}")
            n_fail += 1
            continue
        g, e = canon(grows, gcols), canon(erows, ecols)
        if g != e:
            diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(grows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
