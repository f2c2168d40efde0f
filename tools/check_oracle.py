#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: for every query
result parquet in <outDir>, executes the matching oracle SQL from
oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet) and compares
row count, column names (sorted), and value hash (rows sorted by all
columns, columns sorted by name).

Usage: tools/check_oracle.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb


def canon(rel):
    """DataFrame → (ncols, nrows, hash) with sorted columns+rows."""
    df = rel.df()
    cols = sorted(df.columns)
    df = df[cols]
    con = duckdb.connect()
    con.register("t", df)
    # NULL-sentinel + escaped separator: concat_ws would silently skip NULLs
    # and an unescaped ',' lets different rows collide
    collist = ", ".join(
        f"coalesce(replace(replace(CAST(\"{c}\" AS VARCHAR), '\\\\', '\\\\\\\\'), ',', '\\\\,'), '<NULL>')"
        for c in cols)
    h = con.execute(
        f"SELECT md5(string_agg(r, '|' ORDER BY r)) FROM "
        f"(SELECT concat_ws(',', {collist}) AS r FROM t)"
    ).fetchone()[0]
    return cols, len(df), h


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dirs = set(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    # a query that crashed in Verify has oracle SQL but no output dir —
    # that must be a FAIL, not a silent absence
    names = sorted(dirs | set(oracle))
    n_pass = n_fail = n_weak = 0
    for name in names:
        if name not in dirs:
            print(f"  FAIL  {name}: no Verify output (query crashed?)")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            print(f"  WEAK  {name}: rows={len(got.df())} (no oracle)")
            n_weak += 1
            continue
        try:
            want = con.sql(oracle[name])
        except Exception as e:
            print(f"  FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gt = dict(zip(got.columns, [str(t) for t in got.types]))
        wt = dict(zip(want.columns, [str(t) for t in want.types]))
        gc, gn, gh = canon(got)
        wc, wn, wh = canon(want)
        if gc != wc:
            print(f"  FAIL  {name}: cols {gc} != {wc}")
            n_fail += 1
        elif gt != wt:
            diff = {c: (gt.get(c), wt.get(c))
                    for c in gt if gt.get(c) != wt.get(c)}
            print(f"  FAIL  {name}: dtypes differ {diff}")
            n_fail += 1
        elif gn != wn:
            print(f"  FAIL  {name}: rows {gn} != {wn}")
            n_fail += 1
        elif gh != wh:
            print(f"  FAIL  {name}: value hash mismatch ({gn} rows)")
            n_fail += 1
        else:
            print(f"  PASS  {name} ({gn} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_weak} weak ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
