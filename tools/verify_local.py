#!/usr/bin/env python3
"""Dev-only mimic of the driver's correctness gate.

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB over the same
parquet tables, and compares against the engine's parquet output:
column names (sorted), row count, and a hash over sorted row values.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, math, hashlib
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noora = 0
    for name in names:
        eng = con.execute(
            f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'")
        eng_cols = [d[0] for d in eng.description]
        eng_rows = eng.fetchall()
        if name not in oracles:
            n_noora += 1
            print(f"  [rows-only] {name}: {len(eng_rows)} rows "
                  f"{'OK' if eng_rows else 'EMPTY!'}")
            continue
        try:
            ora = con.execute(oracles[name])
            ora_cols = [d[0] for d in ora.description]
            ora_rows = ora.fetchall()
            # HUGEINT lint: fetchall() silently converts HUGEINT -> Python
            # int, but the driver's canonicalizer renders HUGEINT differently
            # than the engine's BIGINT parquet column and forks the hash.
            # SUM(BIGINT) and integer `//` in DuckDB return HUGEINT: every
            # integral aggregate column must be CAST(... AS BIGINT) in the
            # oracle SQL. Fail hard here before hashing.
            desc = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
            bad_types = [f"{c}:{t}" for c, t, *_ in desc
                         if t.upper() in ("HUGEINT", "UHUGEINT")
                         or (t.upper().startswith("DECIMAL(38"))]
            if bad_types:
                print(f"  [FAIL] {name}: oracle HUGEINT lint: "
                      + ", ".join(bad_types)
                      + "  (wrap in CAST(... AS BIGINT))")
                n_fail += 1
                continue
        except Exception as e:
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(eng_cols) != sorted(ora_cols):
            problems.append(f"cols {sorted(eng_cols)} != {sorted(ora_cols)}")
        if len(eng_rows) != len(ora_rows):
            problems.append(f"rows {len(eng_rows)} != {len(ora_rows)}")
        if not problems and table_hash(eng_rows, eng_cols) != table_hash(ora_rows, ora_cols):
            problems.append("hash mismatch")
            # show first differing sorted line for debugging
            oi = sorted(range(len(eng_cols)), key=lambda i: eng_cols[i])
            oj = sorted(range(len(ora_cols)), key=lambda i: ora_cols[i])
            a = sorted("\x1f".join(canon(r[i]) for i in oi) for r in eng_rows)
            b = sorted("\x1f".join(canon(r[j]) for j in oj) for r in ora_rows)
            for x, y in zip(a, b):
                if x != y:
                    problems.append(f"  engine: {x[:200]}")
                    problems.append(f"  oracle: {y[:200]}")
                    break
        if problems:
            n_fail += 1
            print(f"  [FAIL] {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            n_pass += 1
            print(f"  [ok] {name} ({len(eng_rows)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
