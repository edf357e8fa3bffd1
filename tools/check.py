#!/usr/bin/env python3
"""Local driver-mimic correctness check.

Runs `graft.Verify` output (parquet per query + oracle_sql.json) against
DuckDB on the same sf dir, normalizing like the driver: sort columns by
name, sort rows, compare values. Usage:

    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [query ...]

Run `sbt -batch "runMain graft.Verify <sfDir> <outDir>"` first.
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify values for stable compare (round-trip floats via repr)
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noorc = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{qdir}/*.parquet")],
                        ignore_index=True) if glob.glob(f"{qdir}/*.parquet") else pd.DataFrame()
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got)}")
            n_noorc += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL-sql ] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL-cols] {name}: got {list(g.columns)} want {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"[FAIL-rows] {name}: got {len(g)} want {len(e)}")
            n_fail += 1
            continue
        neq = (g != e)
        if neq.any().any():
            bad = neq.any(axis=1)
            i = bad[bad].index[0]
            print(f"[FAIL-vals] {name}: first diff row {i}:\n  got  {g.iloc[i].to_dict()}\n  want {e.iloc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"[PASS     ] {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noorc} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
