#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each query's parquet
dump from Verify, run its oracle SQL in DuckDB over the same sf dir, and
compare (schema by sorted column names, values as sorted row multisets)."""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        bad.append((name, "no spark output")); continue
    try:
        mine = con.sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')").df()
    except Exception as e:
        bad.append((name, f"spark read: {e}")); continue
    try:
        orc = con.sql(sql).df()
    except Exception as e:
        bad.append((name, f"oracle err: {type(e).__name__}: {e}")); continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    orc = orc.reindex(sorted(orc.columns), axis=1)
    if list(mine.columns) != list(orc.columns):
        bad.append((name, f"cols: spark={list(mine.columns)} oracle={list(orc.columns)}")); continue
    if len(mine) != len(orc):
        bad.append((name, f"rows: spark={len(mine)} oracle={len(orc)}")); continue
    try:
        a = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
        b = orc.sort_values(by=list(orc.columns)).reset_index(drop=True)
        # dtype-insensitive value compare, exact (no tolerance — like a hash)
        import pandas as pd
        same = True
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                if not ((av == bv) | (av.isna() & bv.isna())).all():
                    same = False
                    d = (av - bv).abs().max()
                    bad.append((name, f"col {c} float mismatch, max abs diff {d}")); break
            else:
                if not (av.astype(str) == bv.astype(str)).all():
                    same = False
                    bad.append((name, f"col {c} value mismatch")); break
        if same: ok.append((name, len(mine)))
    except Exception as e:
        bad.append((name, f"compare err: {e}"))

print(f"== PASS {len(ok)} ==")
for n, r in ok: print(f"  PASS {n} ({r} rows)")
print(f"== FAIL {len(bad)} ==")
for n, m in bad: print(f"  FAIL {n}: {m}")
sys.exit(1 if bad else 0)
