#!/usr/bin/env python3
"""Determinism probe comparator: given two graft.Verify output dirs
(e.g. dumped at local[1] and local[8]), assert every query's parquet
output is ROW-SET-identical — sorted-row sha256 per output, schema
included. Partitioning must not be able to flip any emitted row.

Usage: compare_dumps.py <outDirA> <outDirB>
"""
import sys, os, glob, hashlib
import duckdb

a, b = sys.argv[1], sys.argv[2]
names_a = {os.path.basename(p) for p in glob.glob(os.path.join(a, "*"))
           if os.path.isdir(p)}
names_b = {os.path.basename(p) for p in glob.glob(os.path.join(b, "*"))
           if os.path.isdir(p)}
if names_a != names_b:
    print(f"DIR MISMATCH: only in {a}: {sorted(names_a - names_b)}; "
          f"only in {b}: {sorted(names_b - names_a)}")
    sys.exit(1)

con = duckdb.connect()

def dump_hash(d, name):
    rel = con.sql(f"SELECT * FROM read_parquet('{d}/{name}/*.parquet')")
    cols = sorted(rel.columns)
    df = rel.df().reindex(cols, axis=1)
    rows = sorted("|".join(repr(v) for v in row)
                  for row in df.itertuples(index=False))
    h = hashlib.sha256()
    h.update(("|".join(cols)).encode())
    for r in rows:
        h.update(r.encode())
    return h.hexdigest(), len(rows)

fail = 0
for name in sorted(names_a):
    ha, na = dump_hash(a, name)
    hb, nb = dump_hash(b, name)
    if ha == hb:
        print(f"OK   {name}: {na} rows, {ha[:16]}")
    else:
        print(f"FAIL {name}: {na} vs {nb} rows, {ha[:16]} vs {hb[:16]}")
        fail += 1
print(f"{'ALL IDENTICAL' if fail == 0 else f'{fail} DIFFER'} "
      f"({len(names_a)} outputs)")
sys.exit(1 if fail else 0)
