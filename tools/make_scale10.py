#!/usr/bin/env python3
"""Build a 10x scale-up of the sf0.1 testdata (~sf1 equivalent) for scaling
measurements, without touching /root/testdata:

  python3 tools/make_scale10.py [srcDir] [dstDir]
  tools/run_bench.sh <dstDir> 32            # with SPARK_GRAFT_ONLY=...

Scaling axes (chosen to match how 100 TB actually arrives):
 - events: 10 copies with user_id offset per copy — scale-OUT across
   signals (per-signal history length unchanged), the axis that exercises
   keyed-shuffle and state growth;
 - documents: 10 copies with doc_id offset and a copy-index token salt so
   copies are near- (not exact-) duplicates — NOTE this multiplies TRUE
   duplicate mass, so near-dedup output pair counts grow ~45x by
   construction (10-clone families) and near-dedup runtime is expected to
   grow superlinearly WITH ITS OUTPUT, not with the input;
 - embeddings: 10 copies with vec_id offset and a small deterministic
   per-copy perturbation.
TPC-H side tables are copied as-is (they are not the scaling target).
"""
import sys, shutil
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
# scale factor: 10 (default, ~sf1) or any other decade (100 -> ~sf10 for
# the linear-family measurement; run only linear queries there, the
# salted near-dup families grow quadratically in output by design)
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
import os
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.sql(f"""
COPY (
  SELECT event_id + k.k * 10000000 AS event_id, ts,
         user_id + k.k * 1500 AS user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet')
  CROSS JOIN (SELECT unnest(range({factor})) AS k) k
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (
  SELECT doc_id + k.k * 100000 AS doc_id,
         CASE WHEN k.k = 0 THEN text
              ELSE 'copysalt' || CAST(k.k AS VARCHAR) || ' ' || text END AS text,
         lang, source,
         -- keep the stored length truthful for the salted copies
         CASE WHEN k.k = 0 THEN n_chars
              ELSE n_chars + len('copysalt' || CAST(k.k AS VARCHAR) || ' ') END AS n_chars
  FROM read_parquet('{src}/documents.parquet')
  CROSS JOIN (SELECT unnest(range({factor})) AS k) k
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (
  SELECT vec_id + k.k * 10000 AS vec_id,
         [x + 0.001 * k.k FOR x in embedding]::FLOAT[] AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet')
  CROSS JOIN (SELECT unnest(range({factor})) AS k) k
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
for t in ["events", "documents", "embeddings"]:
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(t, n)
