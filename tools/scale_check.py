#!/usr/bin/env python3
"""sf0.1 scale cross-check: check_oracle with a per-oracle wall timeout.

Some oracles are quadratic or recursively-transitive in SQL (all-pairs
baselines, transitive-closure dedup, recursive bandit walks) — their
ORACLE cost explodes at sf0.1 while the engine-side counterparts stay
bucketed/banded. For those, Verify dumps linear-time INVARIANT checks
(scale_invariants.json, see graft.operators.ScaleInvariants): when the
exact oracle blows the budget, the invariants run instead and the query
is reported INV-PASS/INV-FAIL rather than SKIP. A query with neither a
tractable oracle nor invariants is a SKIP (none remain today).

Usage: tools/scale_check.py [sfDir] [outDir] [perQueryTimeoutSec]
"""
import sys, json, os, multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir, out_dir):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    # every dumped query is visible as out_<name> for cross-output
    # consistency invariants (e.g. components checked against the
    # near-dup pair dump as its edge set)
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}"):
            con.sql(f"CREATE VIEW out_{d} AS SELECT * "
                    f"FROM read_parquet('{out_dir}/{d}/*.parquet')")
    return con


def check_one(sf_dir, out_dir, name, sql, q):
    try:
        con = connect(sf_dir, out_dir)
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


def check_invariants(sf_dir, out_dir, name, inv_sql, q):
    try:
        con = connect(sf_dir, out_dir)
        pq = f"{out_dir}/{name}"
        if not os.path.isdir(pq):
            q.put(("MISS", "no spark output")); return
        con.sql(f"CREATE VIEW spark_out AS SELECT * "
                f"FROM read_parquet('{pq}/*.parquet')")
        df = con.sql(inv_sql).df()
        bad = df[df["violations"] != 0]
        if len(bad):
            q.put(("INV-FAIL", "; ".join(
                f"{r['invariant']}={r['violations']}" for _, r in bad.iterrows())))
        else:
            q.put(("INV-PASS", f"{len(df)} invariants, 0 violations"))
    except Exception as e:
        q.put(("ERR", f"{type(e).__name__}: {e}"))


def run_with_budget(target, args, budget):
    q = mp.Queue()
    p = mp.Process(target=target, args=args + (q,))
    p.start()
    p.join(budget)
    if p.is_alive():
        p.terminate(); p.join()
        return None
    return q.get() if not q.empty() else ("ERR", "no result")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf01"
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    inv_path = f"{out_dir}/scale_invariants.json"
    invariants = json.load(open(inv_path)) if os.path.exists(inv_path) else {}
    counts = {"PASS": 0, "FAIL": 0, "INV-PASS": 0, "INV-FAIL": 0,
              "SKIP": 0, "ERR": 0, "MISS": 0}
    for name, sql in sorted(oracle.items()):
        res = run_with_budget(check_one, (sf_dir, out_dir, name, sql), budget)
        if res is None:
            if name in invariants:
                res = run_with_budget(
                    check_invariants,
                    (sf_dir, out_dir, name, invariants[name]), budget)
                if res is None:
                    res = ("ERR", f"invariants exceeded {budget}s too")
                else:
                    status, detail = res
                    res = (status, f"oracle intractable at this sf; {detail}")
            else:
                res = ("SKIP", f"oracle exceeded {budget}s, no invariants")
        status, detail = res
        counts[status] += 1
        print(f"  {status} {name} ({detail})")
    # queries with NO exact oracle but registered invariants (the
    # engine-specific ML-fit / file-size dumps): run their invariant
    # checks directly, so they report INV-PASS instead of vanishing
    for name in sorted(set(invariants) - set(oracle)):
        res = run_with_budget(
            check_invariants, (sf_dir, out_dir, name, invariants[name]), budget)
        if res is None:
            res = ("ERR", f"invariants exceeded {budget}s")
        status, detail = res
        counts[status] += 1
        print(f"  {status} {name} (no exact oracle; {detail})")
    print(f"== PASS {counts['PASS']} / INV-PASS {counts['INV-PASS']} / "
          f"FAIL {counts['FAIL']} / INV-FAIL {counts['INV-FAIL']} / "
          f"SKIP {counts['SKIP']} / ERR {counts['ERR']} ==")
    sys.exit(1 if counts["FAIL"] or counts["INV-FAIL"] or counts["ERR"]
             or counts["MISS"] else 0)


if __name__ == "__main__":
    main()
