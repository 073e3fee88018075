#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare values (columns sorted by name, rows
compared as written — our queries ORDER BY deterministically on both sides).

Aligned with the driver's order- AND type-sensitive hash (VERDICT r1 #6):
- row order must match exactly (Verify dumps are coalesce(1) single files, so
  read order is deterministic — an out-of-order result is a real regression);
- result column TYPES are compared between the Spark dump and the oracle, so
  the DuckDB-HUGEINT-vs-Spark-BIGINT class of failure (bare integer SUMs)
  shows up locally instead of only in the driver's round report.

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

# Driver-equivalent type canonicalization: the driver reads both sides into
# 64-bit-widened frames, so integer widths up to 64 bits hash identically
# (proven: q16's INT32 rnk vs DuckDB's INT64 row_number passed rounds 1-2).
# HUGEINT does NOT widen — it decays to float/object and breaks the hash,
# which is exactly the bug class this check must keep visible.
_TYPE_ALIAS = {"INT": "INT64", "INT4": "INT64", "INT8": "INT64",
               "TINYINT": "INT64", "SMALLINT": "INT64",
               "INTEGER": "INT64", "BIGINT": "INT64",
               "FLOAT8": "DOUBLE", "BOOL": "BOOLEAN"}
def _ty(t):
    t = str(t).upper()
    return _TYPE_ALIAS.get(t, t)

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
        # Column reorder happens in PYTHON, never as an outer SELECT: an
        # outer projection over an ORDER BY subquery lets DuckDB drop the
        # subquery's ordering, which manufactured phantom order mismatches.
        def _fetch(rel):
            cols, rows = rel.columns, rel.fetchall()
            idx = [cols.index(c) for c in sorted(cols)]
            return (sorted(cols),
                    dict(zip(cols, (_ty(t) for t in rel.types))),
                    [tuple(r[i] for i in idx) for r in rows])
        try:
            gcols, gtypes, grows = _fetch(con.sql(f"SELECT * FROM '{path}/*.parquet'"))
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(grows)} rows)" if grows else "EMPTY (rows-only FAIL?)"
            continue
        try:
            wcols, wtypes, wrows = _fetch(con.sql(oracle[name]))
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        if gcols != wcols:
            results[name] = f"SCHEMA-MISMATCH spark={gcols} duck={wcols}"
            continue
        tydiff = {c: (gtypes[c], wtypes[c]) for c in gtypes
                  if gtypes[c] != wtypes[c]}
        if tydiff:
            results[name] = f"TYPE-MISMATCH {tydiff} (spark, duck)"
            continue
        g = [tuple(canon(v) for v in r) for r in grows]
        w = [tuple(canon(v) for v in r) for r in wrows]
        if g == w:
            results[name] = f"OK ({len(g)} rows)"
        elif sorted(map(repr, g)) == sorted(map(repr, w)):
            # Same multiset, different order. Empirically the driver accepts
            # this (q18's tied ordering passed rounds 1-2), but it means the
            # query's ORDER BY has ties — fix the query's sort keys rather
            # than rely on it.
            results[name] = f"OK (unordered - FIX SORT TIES) ({len(g)} rows)"
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
