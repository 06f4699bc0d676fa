#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (t2).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
views named after the parquet tables in <sfDir>, read the Spark result
parquet, sort columns by name + rows by all columns, and diff values.
Not the driver itself — a best-effort local replica to catch dialect and
float-determinism issues before the round gate.
"""
import sys, json, math, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata are single parquet FILES; Spark-written replicas
        # (the scale profiler's output) are DIRECTORIES of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    # replicated events (BuildScaledSf/ProfilePipeline) carry ts as raw
    # BIGINT nanos (Spark cannot write TIMESTAMP(NANOS) parquet); the
    # driver testdata reads as TIMESTAMP_NS. Normalize to the same
    # micros-precision TIMESTAMP the oracle SQL expects.
    ts_type = con.execute("DESCRIBE SELECT ts FROM events").fetchall()[0][1]
    if ts_type == "BIGINT":
        con.execute("CREATE OR REPLACE VIEW events AS "
                    "SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                    "FROM read_parquet('" +
                    (f"{sf_dir}/events.parquet/*.parquet"
                     if os.path.isdir(f"{sf_dir}/events.parquet")
                     else f"{sf_dir}/events.parquet") + "')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_df()
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"FAIL {name}: columns want={wcols} got={gcols}")
            n_fail += 1
            continue
        w = [tuple(norm(v) for v in r) for r in
             want[wcols].itertuples(index=False, name=None)]
        g = [tuple(norm(v) for v in r) for r in
             got[gcols].itertuples(index=False, name=None)]
        w.sort(); g.sort()
        if w == g:
            print(f"PASS {name} ({len(w)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
            for i, (a, b) in enumerate(zip(w, g)):
                if a != b:
                    print(f"  first diff row {i}:\n   want {a}\n   got  {b}")
                    break
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
