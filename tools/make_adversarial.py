#!/usr/bin/env python3
"""Adversarial-skew testdata for the pruned discord/motif/profile path:
the sf0.1 events table plus three degenerate 10^4-segment signals — the
regime where grid pruning's threshold T collapses and a naive candidate
enumeration would blow up to m^2 = 10^8 pairs per signal:

 - signal 777777: FLATLINE — 160k readings of the constant 42.0, i.e.
   10^4 identical 16-row segments after quantization. The duplicate
   collapse must answer nnd = 0 for every segment without enumerating a
   single pair.
 - signal 888888: JITTER (periodic) — 160k readings alternating
   42.00/42.01 on a deterministic PERIODIC bit pattern, so the segments
   collapse into a few dozen duplicate groups (the quantized-flatline
   family); the duplicate collapse still wins.
 - signal 999999: RANDOM (aperiodic) — the same two-level jitter on a
   hash-derived APERIODIC bit, so segments are near-identical yet mostly
   DISTINCT after quantization (qvals in {4200,4201}^16). T is tiny but
   nonzero and no blocking key separates the segments — the inherently
   dense case the cost router must detect and route to the sampled
   upper bound.

Usage:
  python3 tools/make_adversarial.py [srcDir] [dstDir]
  SPARK_GRAFT_ONLY=seg_profile,seg_discord,seg_motif,seg_motif_topk \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_adv.json tools/run_bench.sh <dstDir> 32
"""
import sys, shutil, os
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_adv"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
N = 160000  # 10^4 complete 16-row segments per adversarial signal
con.sql(f"""
COPY (
  SELECT * FROM read_parquet('{src}/events.parquet')
  UNION ALL BY NAME
  SELECT 900000000 + r.range AS event_id,
         (SELECT min(ts) FROM read_parquet('{src}/events.parquet'))
           + to_microseconds(CAST(r.range AS BIGINT)) AS ts,
         777777 AS user_id, 'adversarial_flat' AS event_type,
         42.0 AS value, NULL AS props
  FROM range({N}) r
  UNION ALL BY NAME
  SELECT 920000000 + r.range AS event_id,
         (SELECT min(ts) FROM read_parquet('{src}/events.parquet'))
           + to_microseconds(CAST(r.range AS BIGINT)) AS ts,
         888888 AS user_id, 'adversarial_jitter' AS event_type,
         -- deterministic 0/1 bit, PERIODIC mix: segments collapse into a
         -- few dozen duplicate groups (the quantized-flatline family)
         42.0 + 0.01 * (((r.range * 2654435761) % 9576890767) % 2)
           AS value, NULL AS props
  FROM range({N}) r
  UNION ALL BY NAME
  SELECT 940000000 + r.range AS event_id,
         (SELECT min(ts) FROM read_parquet('{src}/events.parquet'))
           + to_microseconds(CAST(r.range AS BIGINT)) AS ts,
         999999 AS user_id, 'adversarial_random' AS event_type,
         -- APERIODIC bit (hash-derived): segments are near-identical yet
         -- mostly DISTINCT — the inherent worst case where no blocking
         -- key separates them and exactness is genuinely dense
         42.0 + 0.01 * (hash(r.range) % 2) AS value, NULL AS props
  FROM range({N}) r
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/events.parquet')").fetchone()[0]
m = con.sql(f"""SELECT count(*) FROM (
  SELECT user_id, seg FROM (
    SELECT user_id,
      CAST(floor((row_number() OVER (PARTITION BY user_id
        ORDER BY ts, event_id) - 1) / 16) AS BIGINT) AS seg
    FROM read_parquet('{dst}/events.parquet')
    WHERE user_id IN (777777, 888888, 999999))
  GROUP BY 1, 2 HAVING count(*) = 16)""").fetchone()[0]
print(f"events {n} rows; adversarial complete segments {m}")
