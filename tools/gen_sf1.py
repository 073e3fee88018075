#!/usr/bin/env python3
"""Scale-evidence data generator: builds an sf1 corpus (10x sf0.1) for the
fact tables by replicating with SHIFTED KEYS, so joins stay 1:1 per replica
and key uniqueness holds. Dimensions and the fixed-size document/embedding
tables are copied as-is (TPC-H scales dims too, but for scaling EVIDENCE the
fact-side 10x is what exercises shuffles/windows/joins; fixed dims slightly
raise per-key fan — the conservative direction).

events.ts passes through with the SOURCE's physical type (TIMESTAMP(MICROS)
for round-8+ driver corpora, INT64 epoch-nanos for older ones), so both
graft.tables.Tables.events and the DuckDB oracles read the replica exactly
like the corpus it was scaled from.

Usage: python3 tools/gen_sf1.py [dst=/tmp/sf1] [src=/root/testdata/sf0.1] [factor=10]
"""
import os
import shutil
import sys

import duckdb

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)

for t in ["region", "nation", "customer", "supplier", "part",
          "documents", "embeddings"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

con = duckdb.connect()
ko = con.sql(f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
ke = con.sql(f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]

con.sql(f"""COPY (
  SELECT CAST(o_orderkey + i*{ko} AS BIGINT) AS o_orderkey, o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', range(0, {factor}) g(i)
) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT CAST(l_orderkey + i*{ko} AS BIGINT) AS l_orderkey, l_partkey,
         l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
         l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet', range(0, {factor}) g(i)
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT CAST(event_id + i*{ke} AS BIGINT) AS event_id,
         ts,
         user_id, event_type, value, props
  FROM '{src}/events.parquet', range(0, {factor}) g(i)
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

for t in ["orders", "lineitem", "events"]:
    n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"sf1 corpus at {dst} (factor {factor} over {src})")
