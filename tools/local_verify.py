#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff per query.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # exact compare, including floats — the driver hashes raw values,
    # so any bit difference is a real failure. Stringify for sortability
    # (None vs float).
    return repr(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    fails, passes, skips = [], [], []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            fails.append((name, "no spark output"))
            continue
        # read ALL part files — Spark may write multi-part outputs
        spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        try:
            ora_rel = con.sql(sql)
        except Exception as e:
            fails.append((name, f"oracle error: {e}"))
            continue
        s_cols = sorted(spark_rel.columns)
        o_cols = sorted(ora_rel.columns)
        if s_cols != o_cols:
            fails.append((name, f"schema: spark={s_cols} oracle={o_cols}"))
            continue
        s_rows = sorted(tuple(norm(v) for v in r) for r in
                        spark_rel.select(*[f'"{c}"' for c in s_cols]).fetchall())
        o_rows = sorted(tuple(norm(v) for v in r) for r in
                        ora_rel.select(*[f'"{c}"' for c in o_cols]).fetchall())
        if len(s_rows) != len(o_rows):
            extra = [r for r in s_rows if r not in o_rows][:3]
            missing = [r for r in o_rows if r not in s_rows][:3]
            fails.append((name, f"rows: spark={len(s_rows)} oracle={len(o_rows)} "
                          f"spark-only={extra} oracle-only={missing}"))
            continue
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        if diffs:
            fails.append((name, f"{len(diffs)} differing rows, first: "
                          f"spark={diffs[0][0]} oracle={diffs[0][1]}"))
        else:
            passes.append(name)
    for n in passes:
        print(f"PASS {n}")
    for n, why in fails:
        print(f"FAIL {n}: {why}")
    print(f"\n{len(passes)} pass, {len(fails)} fail")
    sys.exit(1 if fails else 0)

main()
