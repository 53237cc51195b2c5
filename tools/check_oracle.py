#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB executing oracle_sql.json over the same parquet tables.
Compares schema (column names sorted), row count, and a value hash with rows
in emitted order. Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf, out = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out_rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(repr(v))
            elif isinstance(v, (np.floating,)):
                cells.append(repr(float(v)))
            elif isinstance(v, (np.integer,)):
                cells.append(str(int(v)))
            else:
                cells.append(str(v))
        out_rows.append("|".join(cells))
    return out_rows

fail = 0
for name, sql in sorted(oracle.items()):
    pdir = os.path.join(out, name)
    try:
        spark_df = pq.read_table(pdir).to_pandas()
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})")
        fail += 1
        continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fail += 1
        continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
        fail += 1
        continue
    a, b = canon(spark_df), canon(duck_df)
    if len(a) != len(b):
        print(f"FAIL {name}: rowcount spark={len(a)} duck={len(b)}")
        fail += 1
        continue
    # driver may sort rows; we compare both as-emitted and sorted
    if a != b and sorted(a) != sorted(b):
        diffs = [(i, x, y) for i, (x, y) in enumerate(zip(sorted(a), sorted(b))) if x != y][:5]
        print(f"FAIL {name}: values differ; first diffs: {diffs}")
        fail += 1
        continue
    order_note = "" if a == b else " (row order differs)"
    print(f"OK   {name}: {len(a)} rows{order_note}")

sys.exit(1 if fail else 0)
