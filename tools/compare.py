#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB over the sf parquet tables and hash-compares against the Verify output
parquet (columns sorted by name, rows as produced)."""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional third arg: write a per-query JSON record in the driver's
# CORRECTNESS_r{N}.json shape (rows/schema/hash match + row counts)
json_out = sys.argv[3] if len(sys.argv) > 3 else None
record = {}
def rec(name, rows=False, schema=False, hash_=False, srows=-1, orows=-1, err=None):
    record[name] = {"rows_match": rows, "schema_match": schema,
        "hash_match": hash_, "spark_rows": srows, "oracle_rows": orows,
        "err": err}

con = duckdb.connect()
# Oracle-side conf for sf1+ runs (harmless at small SF): without an
# explicit memory ceiling + spill directory DuckDB thrashes for hours
# on the heavy graph CTE unrolls at 6M-row lineitem (round-9 note,
# BASELINE.md). Do NOT set preserve_insertion_order=false here: it
# makes DuckDB drop even the final ORDER BY on fetch (measured —
# q217's ordered result came back permuted), which breaks this
# row-by-row compare.
# Overridable for big-SF runs in a quiet window (e.g. the sf10 record:
# nothing else on the host, so the ceiling can take most of RAM and
# the spill dir all free disk).
spill = os.environ.get("GRAFT_DUCKDB_TMP", "/tmp/duckdb_spill")
os.makedirs(spill, exist_ok=True)
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '80GB')}'")
con.execute(f"SET temp_directory='{spill}'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written layout (e.g. the ScaleUp sf1 dir)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_glob:
        print(f"FAIL {name}: no spark output"); fails += 1
        rec(name, err="no spark output"); continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1
        rec(name, err=f"oracle error {e}"[:300]); continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet({spark_glob!r})").fetchdf()
    o = odf[sorted(odf.columns)]
    s_ = sdf[sorted(sdf.columns)]
    if list(o.columns) != list(s_.columns):
        print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s_.columns)}")
        fails += 1
        rec(name, rows=len(o) == len(s_), srows=len(s_), orows=len(o),
            err="schema mismatch"); continue
    if len(o) != len(s_):
        print(f"FAIL {name}: rows oracle={len(o)} spark={len(s_)}"); fails += 1
        rec(name, schema=True, srows=len(s_), orows=len(o),
            err="row count mismatch"); continue
    # The driver's comparer lexsorts rows through pandas BEFORE any
    # stringification; a non-atomic cell (numpy array / list / dict)
    # throws there. Replicate that failure mode so a nested gate
    # column can never pass locally and fail at the driver (round-8
    # q252 shipped ARRAY<BIGINT> and only the driver caught it).
    import numpy as _np
    nested = [c for df in (o, s_) for c in df.columns
              if len(df) and isinstance(df[c].iloc[0], (_np.ndarray, list, dict))]
    if nested:
        print(f"FAIL {name}: non-atomic cell type in columns {sorted(set(nested))} "
              "(driver comparer cannot sort these)")
        fails += 1
        rec(name, rows=True, schema=True, srows=len(s_), orows=len(o),
            err="non-atomic cell type"); continue
    ovals = o.astype(str).values.tolist()
    svals = s_.astype(str).values.tolist()
    if ovals != svals:
        n = 0
        for i, (a, b) in enumerate(zip(ovals, svals)):
            if a != b:
                print(f"FAIL {name}: row {i} oracle={a} spark={b}")
                n += 1
                if n >= 3: break
        fails += 1
        rec(name, rows=True, schema=True, srows=len(s_), orows=len(o),
            err="hash mismatch"); continue
    print(f"OK   {name} ({len(o)} rows)")
    rec(name, rows=True, schema=True, hash_=True, srows=len(s_), orows=len(o))
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
if json_out:
    with open(json_out, "w") as f:
        json.dump(record, f, indent=2, sort_keys=True)
sys.exit(1 if fails else 0)
