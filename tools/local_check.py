#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/local_check.py [sfDir] [outDir] [jsonOut]

With a third argument, also writes a machine-readable per-query record
(the CORRECTNESS_sf0.1_sample.json artifact).

Reads each `<outDir>/<name>` parquet (written by `graft.Verify`), runs the
matching oracle SQL from `<outDir>/oracle_sql.json` in DuckDB against the
fixture tables, and compares value-by-value with columns sorted by name and
rows sorted by all columns — the same normalization the driver describes.
Queries without an oracle get a rows>0 check.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    record = {}
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            record[name] = {"status": "fail", "reason": "no parquet output"}
            n_fail += 1
            continue
        mine = con.sql(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            ok = len(mine) > 0
            print(f"{'ok   ' if ok else 'FAIL '} {name}: rows-only "
                  f"({len(mine)} rows)")
            record[name] = {"status": "ok" if ok else "fail",
                            "mode": "rows_only", "rows": len(mine)}
            n_pass += ok
            n_fail += not ok
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            record[name] = {"status": "fail",
                            "reason": f"oracle SQL error: {e}"[:300]}
            n_fail += 1
            continue
        a, b = normalize(mine), normalize(want)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            record[name] = {"status": "fail", "reason": "column mismatch"}
            n_fail += 1
        elif len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            record[name] = {"status": "fail",
                            "reason": f"rows {len(a)} vs {len(b)}"}
            n_fail += 1
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            print(f"FAIL  {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"      row {i} col {c}: mine={a[c][i]!r} oracle={b[c][i]!r}")
            record[name] = {"status": "fail",
                            "reason": f"value mismatch in {bad_cols}"[:300]}
            n_fail += 1
        else:
            print(f"ok    {name}: {len(a)} rows")
            record[name] = {"status": "ok", "mode": "rows+schema+values",
                            "rows": len(a)}
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if json_out:
        # MERGE into an existing record (same sf_dir): the sample file
        # accumulates family batches across rounds; re-run queries
        # overwrite their own entries. Prior entries whose query no
        # longer exists in the suite are PRUNED — a renamed/removed
        # query must not keep counting as verified forever. The live
        # set is the COMPLETE suite name list (suite_queries.json,
        # dumped by Verify even on subset runs); falling back to the
        # oracle map keeps old outDirs working, but only the full list
        # protects a rows-only query (no oracle SQL) from being
        # dropped by a later subset run's merge.
        if os.path.exists(json_out):
            try:
                with open(json_out) as f:
                    prior = json.load(f)
                if prior.get("sf_dir") == sf_dir:
                    live = set(oracles) | set(record)
                    suite_file = os.path.join(out_dir, "suite_queries.json")
                    if os.path.exists(suite_file):
                        with open(suite_file) as f:
                            live |= set(json.load(f))
                    merged = {k: v for k, v in
                              prior.get("queries", {}).items() if k in live}
                    merged.update(record)
                    record = merged
            except Exception:
                pass
        total_pass = sum(1 for v in record.values() if v.get("status") == "ok")
        total_fail = len(record) - total_pass
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "passed": total_pass,
                       "failed": total_fail, "queries": record},
                      f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({total_pass} ok / {total_fail} fail "
              f"across {len(record)} recorded)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
