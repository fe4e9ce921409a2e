#!/usr/bin/env python3
"""Automated exactness proof for the blocked near-dup oracles (ADVICE r16).

The DuckDB oracles for the near-duplicate family block candidate pairs
with the same public toolkit the operator under test uses (prefix /
length / AdaptJoin extended-prefix / PPJoin position filters — see
SparkEntry.shinglePrefixPairCtes). That sharing weakens oracle
independence: an edit to the shared filter logic could regress oracle
and operator in agreement. This script re-proves, on every run, that the
BLOCKED oracle is byte-equal to the NAIVE all-pairs list_intersect
oracle — the one whose correctness is self-evident — at small scale
factors where the naive O(N^2) join is tractable.

Usage: oracle_parity.py <verifyOutDir> <sfDir> [<sfDir> ...]

<verifyOutDir> must hold the oracle_sql.json dumped by graft.Verify (the
blocked SQL is read from there, so the proof covers exactly what the
correctness gate runs, not a copy that can drift).

Writes one JSON line per scale factor to stdout; exits non-zero on any
mismatch.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

NAIVE = """
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text)-4, 1) + 1),
                       i -> text[i:i+4])) AS sh
  FROM documents),
p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         len(list_intersect(a.sh, b.sh)) AS i, len(a.sh) AS l1, len(b.sh) AS l2
  FROM s a JOIN s b ON a.doc_id < b.doc_id)
SELECT id1, id2, round(CAST(i AS DOUBLE) / (l1 + l2 - i), 6) AS jaccard
FROM p WHERE CAST(i AS DOUBLE) / (l1 + l2 - i) >= 0.9
ORDER BY id1, id2
"""


def table_sql(sf_dir, name):
    d = os.path.join(sf_dir, f"{name}.parquet")
    pat = os.path.join(d, "*.parquet") if os.path.isdir(d) else d
    return f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')"


def main():
    verify_out, sf_dirs = sys.argv[1], sys.argv[2:]
    with open(os.path.join(verify_out, "oracle_sql.json")) as f:
        oracles = json.load(f)
    blocked = oracles["doc_near_dup"]
    ok = True
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        con.execute(table_sql(sf_dir, "documents"))
        b = con.execute(blocked).fetchdf().reset_index(drop=True)
        n = con.execute(NAIVE).fetchdf().reset_index(drop=True)
        b.columns = [c.lower() for c in b.columns]
        n.columns = [c.lower() for c in n.columns]
        match = b.shape == n.shape and bool(
            (b[["id1", "id2", "jaccard"]].values == n[["id1", "id2", "jaccard"]].values).all())
        ok = ok and match
        print(json.dumps({
            "check": "oracle_parity", "gate": "doc_near_dup", "sf_dir": sf_dir,
            "blocked_pairs": int(len(b)), "naive_pairs": int(len(n)),
            "match": bool(match)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
