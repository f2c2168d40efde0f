#!/usr/bin/env python3
"""Build a key-shifted 10x replica of a testdata scale-factor directory.

Each copy i shifts every join/entity key by i * (max_key + 1), so key
cardinalities, join fan-outs, and group counts scale with the data (a naive
UNION ALL would only deepen per-key row counts). Text/embedding payloads are
replicated as-is — which deliberately turns every document into a 10-way
exact duplicate, a realistic stress for the dedup pipeline.

Usage: tools/make_10x.py <srcDir> <dstDir> [copies]
"""
import os
import sys

import duckdb

# Columns are grouped into key FAMILIES (the foreign-key equivalence
# classes); every member of a family shifts by the family-wide base =
# max over ALL member columns + 1, so FK joins stay intact in every copy
# even when one side's max key is unreferenced by the other.
FAMILIES = {
    "regionkey": [("region", "r_regionkey"), ("nation", "n_regionkey")],
    "nationkey": [("nation", "n_nationkey"), ("customer", "c_nationkey"),
                  ("supplier", "s_nationkey")],
    "custkey":   [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey":  [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey":   [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey":   [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id":  [("events", "event_id")],
    "user_id":   [("events", "user_id")],
    "doc_id":    [("documents", "doc_id")],
    "vec_id":    [("embeddings", "vec_id")],
}

SHIFTS = {
    "region":   [("r_regionkey", "INTEGER")],
    "nation":   [("n_nationkey", "INTEGER"), ("n_regionkey", "INTEGER")],
    "customer": [("c_custkey", "BIGINT"), ("c_nationkey", "INTEGER")],
    "supplier": [("s_suppkey", "BIGINT"), ("s_nationkey", "INTEGER")],
    "part":     [("p_partkey", "BIGINT")],
    "orders":   [("o_orderkey", "BIGINT"), ("o_custkey", "BIGINT")],
    "lineitem": [("l_orderkey", "BIGINT"), ("l_partkey", "BIGINT"),
                 ("l_suppkey", "BIGINT")],
    "events":   [("event_id", "BIGINT"), ("user_id", "BIGINT")],
    "documents": [("doc_id", "BIGINT")],
    "embeddings": [("vec_id", "BIGINT")],
}


def family_bases(con, src):
    """column name -> family-wide shift base."""
    base_of_col = {}
    for members in FAMILIES.values():
        mx = 0
        for table, colname in members:
            path = f"{src}/{table}.parquet"
            if os.path.exists(path):
                v = con.execute(
                    f"SELECT max({colname}) FROM '{path}'").fetchone()[0]
                mx = max(mx, v or 0)
        for _, colname in members:
            base_of_col[colname] = mx + 1
    return base_of_col


def main(src, dst, copies=10):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    base_of_col = family_bases(con, src)
    for table, keys in SHIFTS.items():
        path = f"{src}/{table}.parquet"
        if not os.path.exists(path):
            continue
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
        bases = {k: base_of_col[k] for k, _ in keys}
        selects = []
        for i in range(copies):
            proj = ", ".join(
                f"CAST({c} + {i * bases[c]} AS "
                f"{dict(keys)[c]}) AS {c}" if c in bases else c
                for c in cols)
            selects.append(f"SELECT {proj} FROM '{path}'")
        union = " UNION ALL ".join(selects)
        # small row groups so Spark scans parallelize across cores
        con.execute(
            f"COPY ({union}) TO '{dst}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 65536)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dst, copies)
