#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare values (columns sorted by name, rows
compared as written — our queries ORDER BY deterministically on both sides).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>
"""
import json, sys, math, glob, os
import duckdb

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return str(v) if not isinstance(v, (int, bool)) else v

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path):
            continue
        try:
            got = con.sql(f"SELECT * FROM '{path}/*.parquet'")
            gcols = sorted(got.columns)
            grows = con.sql(
                f"SELECT {', '.join(gcols)} FROM '{path}/*.parquet'").fetchall()
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(grows)} rows)" if grows else "EMPTY (rows-only FAIL?)"
            continue
        try:
            want = con.sql(oracle[name])
            wcols = sorted(want.columns)
            wrows = con.sql(
                f"SELECT {', '.join(wcols)} FROM ({oracle[name]})").fetchall()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        if gcols != wcols:
            results[name] = f"SCHEMA-MISMATCH spark={gcols} duck={wcols}"
            continue
        g = [tuple(canon(v) for v in r) for r in grows]
        w = [tuple(canon(v) for v in r) for r in wrows]
        if g == w:
            results[name] = f"OK ({len(g)} rows)"
        elif sorted(map(repr, g)) == sorted(map(repr, w)):
            results[name] = f"OK-unordered ({len(g)} rows)"
        else:
            diff = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
            results[name] = (f"VALUE-MISMATCH nspark={len(g)} nduck={len(w)} "
                             f"first_diffs={diff}")
    bad = 0
    for k, v in results.items():
        flag = "  " if v.startswith(("OK", "rows-only")) else "XX"
        if flag == "XX":
            bad += 1
        print(f"{flag} {k}: {v}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
