#!/usr/bin/env python3
"""Time DuckDB on every registered oracle SQL — the baseline half of a
paired Spark-vs-DuckDB suite measurement.

Usage:
  python3 tools/bench_duck.py <sf_dir> <oracle_sql.json> [out.json]

`oracle_sql.json` is the dump graft.Verify writes (name -> SQL). The
Spark half is `graft.Bench` (SPARK_GRAFT_REPS for min-of-k). Run the
two back-to-back on an otherwise idle box and record the sha256
yardstick alongside (PLANS.md "Box weather"): single-core
`python3 -c "import hashlib; h=b'x'
for i in range(2_000_000): h=hashlib.sha256(h).digest()"` ~1.0-1.2 s
when the host is healthy, ~2.2 s when oversubscribed — paired ratios
measured on a degraded box overstate Spark's JVM-heavy side.
"""
import duckdb, json, os, sys, time

def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    d, sql_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/duck_bench.json"
    sqls = json.load(open(sql_path))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            con.execute(
                f"CREATE VIEW {f[:-8]} AS "
                f"SELECT * FROM read_parquet('{d}/{f}')")
    tot, per = 0.0, {}
    for name, sql in sqls.items():
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        per[name] = round(dt, 3)
        tot += dt
    print(json.dumps({"total": round(tot, 1), "n": len(sqls), "dir": d}))
    json.dump(per, open(out, "w"))
    print(sorted(per.items(), key=lambda x: -x[1])[:8])

if __name__ == "__main__":
    main()
