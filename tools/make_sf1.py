#!/usr/bin/env python3
"""Build true-10x 'sf1' rehearsal tables from the driver's sf0.1 data.

Ten shards of each graft-facing table (events / documents / embeddings),
decorrelated so the scaled corpus keeps sf0.1's per-key statistics
instead of stacking 10 exact copies onto every band bucket / embedding
neighborhood (which would measure a synthetic dup explosion, not scale):

- events:    user_id shifts per shard (10x the series universe; the tag
             derivation is user_id-based), event_id/seq stay globally
             unique, ts keeps the same queried window, value gets a
             tiny per-shard offset.
- documents: shard s>0 suffixes every token with ~s -- shard vocabularies
             are disjoint, so shingles never match across shards and the
             near-dup rate per shard equals sf0.1's (total pairs grow
             linearly, the honest 10x).
- embeddings: shard s rotates the 64 dims by s positions -- norms are
             preserved, and a rotated vector decorrelates from its
             source, so ANN neighborhoods keep sf0.1's density.

Other tables symlink to sf0.1 (no graft gate reads them).

Usage: python3 tools/make_sf1.py [dst_dir] [shards]
       (defaults /dev/shm/sf1, 10; the r13 sf10 rehearsal uses
        `python3 tools/make_sf1.py /dev/shm/sf10 100`)

Shard counts above the embedding dimensionality (64) reuse rotations,
so shards s >= 64 additionally NEGATE the vector: norms and
within-shard cosines are untouched (both sides of any within-shard
pair flip), while a shard sharing its rotation with shard s-64 sees
cos -> -cos, so no cross-shard exact duplicates appear.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1"
SHARDS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads TO 16")

con.sql(f"""
COPY (
  SELECT e.event_id + s.s * 1000000000 AS event_id,
         e.ts,
         e.user_id + s.s * 1000000 AS user_id,
         e.event_type,
         e.value + s.s * 0.001 AS value,
         e.props
  FROM '{SRC}/events.parquet' e,
       (SELECT unnest(range({SHARDS})) AS s) s
  ORDER BY event_id
) TO '{DST}/events.parquet' (FORMAT parquet)
""")

con.sql(f"""
COPY (
  SELECT d.doc_id + s.s * 1000000 AS doc_id,
         CASE WHEN s.s = 0 THEN d.text
              ELSE array_to_string(
                list_transform(string_split(d.text, ' '),
                               w -> w || '~' || s.s), ' ')
         END AS text,
         d.lang, d.source, d.n_chars
  FROM '{SRC}/documents.parquet' d,
       (SELECT unnest(range({SHARDS})) AS s) s
  ORDER BY doc_id
) TO '{DST}/documents.parquet' (FORMAT parquet)
""")

con.sql(f"""
COPY (
  SELECT e.vec_id + s.s * 1000000 AS vec_id,
         CAST(list_transform(
           CASE WHEN s.s % 64 = 0 THEN e.embedding
                ELSE CAST(list_concat(e.embedding[s.s % 64 + 1:],
                                      e.embedding[1:s.s % 64]) AS FLOAT[])
           END,
           x -> x * (CASE WHEN s.s >= 64 THEN -1 ELSE 1 END)) AS FLOAT[])
           AS embedding,
         e.label
  FROM '{SRC}/embeddings.parquet' e,
       (SELECT unnest(range({SHARDS})) AS s) s
  ORDER BY vec_id
) TO '{DST}/embeddings.parquet' (FORMAT parquet)
""")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]:
    link = os.path.join(DST, f"{t}.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(SRC, f"{t}.parquet"), link)

for t in ["events", "documents", "embeddings"]:
    n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"sf1 tables ready under {DST}")
