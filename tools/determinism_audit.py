#!/usr/bin/env python3
"""Partition-count-invariance audit: compare two graft.Verify output
directories (e.g. produced at SPARK_GRAFT_CPUS=32 and =7) by hashing
every query's result table sorted by all columns. Bit-identical hashes
across parallelism levels prove results do not depend on partition
count — the property SCALE.md claims.

Usage: determinism_audit.py <dirA> <dirB>
"""
import hashlib
import json
import sys

import duckdb


def table_hash(con, parquet_dir: str) -> str:
    rel = con.sql(f"SELECT * FROM read_parquet('{parquet_dir}/*.parquet')")
    cols = rel.columns
    order = ", ".join(f'"{c}"' for c in cols)
    rows = con.sql(
        f"SELECT * FROM read_parquet('{parquet_dir}/*.parquet') ORDER BY {order}"
    ).fetchall()
    h = hashlib.sha256()
    h.update(("|".join(cols) + "\n").encode())
    for r in rows:
        h.update(repr(r).encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    a, b = sys.argv[1], sys.argv[2]
    import os

    names = sorted(
        n for n in os.listdir(a)
        if os.path.isdir(os.path.join(a, n))
    )
    names_b = {
        n for n in os.listdir(b) if os.path.isdir(os.path.join(b, n))
    }
    missing = [n for n in names if n not in names_b]
    if missing:
        print(f"MISSING in {b}: {missing}")
        return 1
    con = duckdb.connect()
    bad = []
    for n in names:
        ha = table_hash(con, os.path.join(a, n))
        hb = table_hash(con, os.path.join(b, n))
        if ha != hb:
            bad.append(n)
            print(f"  [DIFF] {n}")
    print(json.dumps({
        "n_queries": len(names),
        "identical": len(names) - len(bad),
        "diffs": bad,
    }))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
