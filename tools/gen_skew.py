#!/usr/bin/env python3
"""Skew-evidence generator: builds an sf0.1-SKEW corpus with the SAME row
counts as sf0.1 but adversarial key/size distributions, so any runtime ratio
vs the uniform corpus measures skew sensitivity, not volume. The two decade
generators (gen_sf1.py, gen_docs10.py) scale VOLUME; this one holds volume
~constant and injects the three skew families a real 100 TB corpus hits
first:

- documents: ZIPFIAN LENGTHS at a conserved total-char budget. Docs are
  ranked by a hash permutation of doc_id (hot docs scatter across the id
  space, so they don't co-locate in one input split by accident); rank r
  gets target length T/(r*H_N) (zipf s=1, H_N the harmonic number), floored
  at 40 chars; the text is the original repeated/truncated to the target,
  preserving token structure. Head doc ~160 K chars (~550x average) — one
  map task owns a giant doc.
- documents: a HOT SHINGLE FAMILY. 20% of docs (hash-selected) are prefixed
  with one fixed 40-token boilerplate paragraph, so its ~38 shingles reach
  df ~1000 — 10x over the inverted index's df<=100 stop-shingle cap. This is
  the template-boilerplate skew the dedup family claims to survive.
- events: a HOT USER. 25% of events are reassigned to one user_id (the
  minimum) — a 25 K-row key against a ~67-row average; exercises q55's
  salted aggregation and every per-user window/session query.
- lineitem: a HOT ORDER KEY. 15% of lineitem rows are reassigned to the
  minimum l_orderkey (~90 K rows on one join/shuffle key); orders is left
  unique, so join multiplicity stays 1 and the skew lands exactly on the
  shuffle partition — what q82's salting and AQE's skew split are for.

Row counts are unchanged everywhere; total document chars grow only by the
boilerplate prefixes (~+17%, printed). Correctness is NOT oracle-checked at
this corpus (several oracles are O(n^2) in the hot key by construction);
this corpus exists for Bench/Profile ratios, recorded in BASELINE.md.

A sibling sf0.001 symlink is created next to dst so Bench's warm pass finds
its usual small corpus.

Usage: python3 tools/gen_skew.py [dst=/tmp/skew/sf0.1skew] [src=/root/testdata/sf0.1]
"""
import os
import shutil
import sys

import duckdb

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew/sf0.1skew"
src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
os.makedirs(dst, exist_ok=True)

warm = os.path.join(os.path.dirname(dst.rstrip("/")), "sf0.001")
warm_src = os.path.join(os.path.dirname(src.rstrip("/")), "sf0.001")
if not os.path.exists(warm) and os.path.isdir(warm_src):
    os.symlink(warm_src, warm)

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "embeddings"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

con = duckdb.connect()

BOILER = " ".join(f"boilerplate{i} clause{i % 7} standard" for i in range(14))[:260]
# 14*3 = 42 tokens -> ~40 identical shingles shared by every hot doc.

n_docs, total_chars = con.sql(
    f"SELECT count(*), CAST(sum(n_chars) AS BIGINT) FROM '{src}/documents.parquet'"
).fetchone()
# Harmonic number H_N for the zipf normalization, as a SQL literal.
h_n = sum(1.0 / r for r in range(1, n_docs + 1))

con.sql(f"""COPY (
  WITH ranked AS (
    SELECT *, row_number() OVER (ORDER BY hash(doc_id), doc_id) AS r
    FROM '{src}/documents.parquet'),
  shaped AS (
    SELECT doc_id, lang, source,
           GREATEST(40, CAST({total_chars} / (r * {h_n}) AS BIGINT)) AS tlen,
           text
    FROM ranked),
  sized AS (
    SELECT doc_id, lang, source,
           substr(repeat(text || ' ', CAST(CEIL(tlen * 1.0 / (len(text) + 1)) AS BIGINT)),
                  1, CAST(tlen AS INT)) AS body
    FROM shaped)
  SELECT doc_id,
         CASE WHEN hash(doc_id + 77) % 5 = 0
              THEN '{BOILER} ' || body ELSE body END AS text,
         lang, source,
         CAST(len(CASE WHEN hash(doc_id + 77) % 5 = 0
              THEN '{BOILER} ' || body ELSE body END) AS BIGINT) AS n_chars
  FROM sized ORDER BY doc_id
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT event_id, ts,
         CASE WHEN hash(event_id) % 4 = 0
              THEN (SELECT min(user_id) FROM '{src}/events.parquet')
              ELSE user_id END AS user_id,
         event_type, value, props
  FROM '{src}/events.parquet' ORDER BY event_id
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT CASE WHEN hash(l_orderkey * 131 + l_linenumber) % 20 < 3
              THEN (SELECT min(l_orderkey) FROM '{src}/lineitem.parquet')
              ELSE l_orderkey END AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet'
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

for t, q in [
    ("documents", "count(*), CAST(sum(n_chars) AS BIGINT), max(n_chars)"),
    ("events", "count(*), CAST(max(cnt) AS BIGINT) FROM (SELECT count(*) AS cnt FROM T GROUP BY user_id)"),
    ("lineitem", "count(*), CAST(max(cnt) AS BIGINT) FROM (SELECT count(*) AS cnt FROM T GROUP BY l_orderkey)"),
]:
    if " FROM " in q:
        inner = q.replace("FROM T", f"FROM '{dst}/{t}.parquet'")
        row = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone() + \
              con.sql(f"SELECT {inner.split(', ', 1)[1]}").fetchone()
    else:
        row = con.sql(f"SELECT {q} FROM '{dst}/{t}.parquet'").fetchone()
    print(t, row)
hot_df = con.sql(f"""
  SELECT count(*) FROM '{dst}/documents.parquet'
  WHERE starts_with(text, 'boilerplate0')""").fetchone()[0]
print(f"hot-boilerplate docs: {hot_df} (uniform source total chars: {total_chars})")
print(f"skew corpus at {dst} (same row counts as {src})")
