#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare to the Spark parquet dumped by
graft.Verify (sorted columns by name, sorted rows, value compare)."""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = 0
for q, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, q)
    files = glob.glob(os.path.join(spark_dir, "*.parquet"))
    if not files:
        print(f"[MISS] {q}: no spark output")
        fails += 1
        continue
    try:
        ora = con.sql(sql).df()
    except Exception as e:
        print(f"[ORACLE-ERR] {q}: {e}")
        fails += 1
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
    ora = ora.reindex(sorted(ora.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(ora.columns) != list(got.columns):
        print(f"[SCHEMA] {q}: oracle={list(ora.columns)} got={list(got.columns)}")
        fails += 1
        continue
    ora = ora.sort_values(by=list(ora.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(ora) != len(got):
        print(f"[ROWS] {q}: oracle={len(ora)} got={len(got)}")
        fails += 1
        continue
    # dtype-strict (r6): the driver hashes TYPED values, so a dtype
    # mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark BIGINT -> int64,
    # the r5 txt_pack failure) must fail HERE too — the local gate may
    # never be weaker than the driver's.
    if list(ora.dtypes) != list(got.dtypes):
        bad = [(c, str(a), str(b)) for c, a, b in
               zip(ora.columns, ora.dtypes, got.dtypes) if a != b]
        print(f"[DTYPE] {q}: oracle vs got differ on {bad}")
        fails += 1
        continue
    try:
        pd.testing.assert_frame_equal(ora, got, check_dtype=True, check_exact=False, rtol=1e-9)
        print(f"[OK] {q}: {len(got)} rows")
    except AssertionError as e:
        print(f"[DIFF] {q}: {str(e).splitlines()[-1] if str(e) else 'mismatch'}")
        print(ora.head(3).to_string(), "\n--- got:\n", got.head(3).to_string())
        fails += 1
sys.exit(1 if fails else 0)
