#!/usr/bin/env python3
"""Scale-evidence generator for the DOCUMENT/EMBEDDING families (the dedup,
similarity, text-analysis, pipeline, and corpus queries): builds a corpus with
documents x10 and embeddings x10 while the fact tables are copied as-is — the
complement of gen_sf1.py, which scales facts and holds documents fixed.

Replication must not manufacture quadratic DATA: identical replicas would make
every doc a 10-way exact duplicate and every vector a 10-way cosine-1 match,
so candidate-pair COUNTS would grow ~100x by construction and no algorithm
could look linear. Instead each replica is perturbed so the near-dup/ANN
density per unit of corpus stays constant, which is what real corpus growth
looks like:

- documents: replica i > 0 suffixes every token with "~i"
  (regexp_replace '(\\S+)' -> '\\1~i'). Token counts, length profile, and
  the WITHIN-replica shingle/duplicate structure are preserved exactly;
  CROSS-replica shingles are disjoint, so the duplicate-pair density scales
  linearly with the corpus. n_chars is recomputed (it equals len(text) in
  the driver corpus).
- embeddings: replica i rotates the 64 dimensions by 7*i positions.
  Rotation is a permutation: norms and all WITHIN-replica angles are
  preserved exactly (each replica is an isometric copy of the original
  geometry); CROSS-replica cosines decorrelate.

Usage: python3 tools/gen_docs10.py [dst=/tmp/docs10] [src=/root/testdata/sf0.1] [factor=10]
"""
import os
import shutil
import sys

import duckdb

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/docs10"
src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

con = duckdb.connect()
kd = con.sql(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
kv = con.sql(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
dim = con.sql(f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1").fetchone()[0]

con.sql(f"""COPY (
  SELECT CAST(doc_id + i*{kd} AS BIGINT) AS doc_id,
         CASE WHEN i = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1~' || i, 'g') END AS text,
         lang, source,
         CAST(len(CASE WHEN i = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1~' || i, 'g') END) AS BIGINT) AS n_chars
  FROM '{src}/documents.parquet', range(0, {factor}) g(i)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT CAST(vec_id + i*{kv} AS BIGINT) AS vec_id,
         list_transform(range(1, {dim} + 1),
           j -> embedding[CAST((j - 1 + i*7) % {dim} AS BIGINT) + 1]) AS embedding,
         label
  FROM '{src}/embeddings.parquet', range(0, {factor}) g(i)
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

for t in ["documents", "embeddings"]:
    n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"docs-decade corpus at {dst} (factor {factor} over {src})")
