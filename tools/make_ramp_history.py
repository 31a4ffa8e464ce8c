#!/usr/bin/env python3
"""Long-EXACT-history replay input for the streaming matrix profile:
two drifting-ramp signals whose segments are all DISTINCT and SPREAD in
first-chunk sum — the regime that routes 'exact' at any history length
(grid_pairs stays tiny) and therefore exercises the exact-side
incremental fold's history scan. Before the grid-pruned fold, every
micro-batch paid O(m·δ) rep distances plus an O(m log m) group-rank
window over the FULL landed history; after it, only δ's cell
neighborhoods enter the distance pass, so the marginal batch cost must
stop growing with m.

The readings are written as `files` contiguous time slices (per-signal
seg-ordered appends, the precondition segmentStream guarantees in
production), so with maxFilesPerTrigger=1 each trigger folds one
slice and the history grows by m/files segments per batch.

Usage: python3 tools/make_ramp_history.py [dstDir] [segments] [files]
"""
import os, shutil, sys
import duckdb

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_ramp"
m = int(sys.argv[2]) if len(sys.argv) > 2 else 10000   # segments/signal
files = int(sys.argv[3]) if len(sys.argv) > 3 else 8
rows = m * 16                                          # readings/signal

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
con = duckdb.connect()
per = rows // files
for f in range(files):
    lo, hi = f * per, (f + 1) * per if f < files - 1 else rows
    con.sql(f"""
    COPY (
      SELECT 900000000 + r.range AS event_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_microseconds(CAST(r.range AS BIGINT)) AS ts,
             555555 AS user_id,
             -- ramp UP: one constant value per 16-row segment, so every
             -- segment is distinct and chunk sums spread by 400/segment
             CAST(r.range // 16 AS DOUBLE) AS value
      FROM range({lo}, {hi}) r
      UNION ALL BY NAME
      SELECT 940000000 + r.range AS event_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_microseconds(CAST(r.range AS BIGINT)) AS ts,
             666666 AS user_id,
             -- ramp DOWN, offset so the two signals never collide
             CAST({m} - (r.range // 16) AS DOUBLE) + 0.25 AS value
      FROM range({lo}, {hi}) r
      ORDER BY event_id
    ) TO '{dst}/part-{f:03d}.parquet' (FORMAT PARQUET)
    """)
print(f"wrote {files} slices x {per} rows/signal x 2 signals -> {dst} "
      f"({m} segments/signal)")
