#!/usr/bin/env python3
"""sf10-scale oracle compare: entirely inside DuckDB (spill-friendly) —
multiset equality via GROUP-BY-all-columns counts compared both ways."""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET memory_limit='24GB'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_glob:
        print(f"FAIL {name}: no spark output", flush=True); fails += 1; continue
    try:
        con.execute(f"CREATE OR REPLACE VIEW o AS ({sql})")
        con.execute(f"CREATE OR REPLACE VIEW s AS SELECT * FROM read_parquet({spark_glob!r})")
        ocols = [d[0] for d in con.execute("DESCRIBE o").fetchall()]
        scols = [d[0] for d in con.execute("DESCRIBE s").fetchall()]
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns {sorted(ocols)} vs {sorted(scols)}", flush=True)
            fails += 1; continue
        cols = ", ".join(f'"{c}"' for c in sorted(ocols))
        n = con.execute(f"""
          SELECT count(*) FROM (
            (SELECT {cols}, count(*) cnt FROM o GROUP BY ALL
             EXCEPT
             SELECT {cols}, count(*) cnt FROM s GROUP BY ALL)
            UNION ALL
            (SELECT {cols}, count(*) cnt FROM s GROUP BY ALL
             EXCEPT
             SELECT {cols}, count(*) cnt FROM o GROUP BY ALL))""").fetchone()[0]
        rows = con.execute("SELECT count(*) FROM o").fetchone()[0]
        if n:
            print(f"FAIL {name}: {n} multiset diffs", flush=True); fails += 1
        else:
            print(f"OK   {name} ({rows} rows, multiset)", flush=True)
    except Exception as e:
        print(f"FAIL {name}: error {e}", flush=True); fails += 1
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
