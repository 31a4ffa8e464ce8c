#!/usr/bin/env python3
"""sf0.1 scale cross-check: check_oracle with a per-oracle wall timeout.

Some oracles are quadratic or recursively-transitive in SQL (all-pairs
baselines, transitive-closure dedup) — their ORACLE cost explodes at
sf0.1 while the engine-side counterparts stay bucketed/banded. Those
time out and are reported as SKIP (intractable-oracle), not failures.

Usage: tools/scale_check.py [sfDir] [outDir] [perQueryTimeoutSec]
"""
import sys, json, os, multiprocessing as mp


def check_one(sf_dir, out_dir, name, sql, q):
    try:
        import duckdb
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            con.sql(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf_dir}/{t}.parquet')")
        pq = f"{out_dir}/{name}"
        if not os.path.isdir(pq):
            q.put(("MISS", "no spark output")); return
        mine = con.sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')").df()
        orc = con.sql(sql).df()
        mine = mine.reindex(sorted(mine.columns), axis=1)
        orc = orc.reindex(sorted(orc.columns), axis=1)
        if list(mine.columns) != list(orc.columns):
            q.put(("FAIL", f"cols {list(mine.columns)} vs {list(orc.columns)}")); return
        if len(mine) != len(orc):
            q.put(("FAIL", f"rows {len(mine)} vs {len(orc)}")); return
        a = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
        b = orc.sort_values(by=list(orc.columns)).reset_index(drop=True)
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                if not ((av == bv) | (av.isna() & bv.isna())).all():
                    q.put(("FAIL", f"col {c} float mismatch")); return
            else:
                if not (av.astype(str) == bv.astype(str)).all():
                    q.put(("FAIL", f"col {c} value mismatch")); return
        q.put(("PASS", len(mine)))
    except Exception as e:
        q.put(("ERR", f"{type(e).__name__}: {e}"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf01"
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    counts = {"PASS": 0, "FAIL": 0, "SKIP": 0, "ERR": 0, "MISS": 0}
    for name, sql in sorted(oracle.items()):
        q = mp.Queue()
        p = mp.Process(target=check_one, args=(sf_dir, out_dir, name, sql, q))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate(); p.join()
            counts["SKIP"] += 1
            print(f"  SKIP {name} (oracle exceeded {budget}s — "
                  "quadratic/transitive in SQL)")
        else:
            status, detail = q.get() if not q.empty() else ("ERR", "no result")
            counts[status] += 1
            print(f"  {status} {name} ({detail})")
    print(f"== PASS {counts['PASS']} / FAIL {counts['FAIL']} / "
          f"SKIP(intractable) {counts['SKIP']} / ERR {counts['ERR']} ==")
    sys.exit(1 if counts["FAIL"] or counts["ERR"] or counts["MISS"] else 0)


if __name__ == "__main__":
    main()
