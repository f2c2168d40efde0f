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

Per-query failures (OOM at large scale factors) and wall-clock cap
breaches are RECORDED, not fatal — the paired artifact must state
which baseline legs did not finish rather than dying mid-suite.
DUCK_QUERY_CAP_S (default 900) interrupts a single runaway query;
DUCK_MEM_LIMIT (e.g. "64GB") bounds the allocator. DUCK_TMP_DIR points
spill at a volume with room (DuckDB's default is CWD/.tmp — the r13 10x
t26 leg died on a full root volume there), and DUCK_TMP_LIMIT caps it
(SET max_temp_directory_size) so a runaway spill degrades to a recorded
per-query error instead of filling the disk for every later query.
"""
import json
import os
import sys
import threading
import time

import duckdb


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    d, sql_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/duck_bench.json"
    cap = float(os.environ.get("DUCK_QUERY_CAP_S", "900"))
    sqls = json.load(open(sql_path))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    mem = os.environ.get("DUCK_MEM_LIMIT")
    if mem:
        con.execute(f"SET memory_limit = '{mem}'")
    tmp = os.environ.get("DUCK_TMP_DIR")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory = '{tmp}'")
    tmp_cap = os.environ.get("DUCK_TMP_LIMIT")
    if tmp_cap:
        con.execute(f"SET max_temp_directory_size = '{tmp_cap}'")
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            con.execute(
                f"CREATE VIEW {f[:-8]} AS "
                f"SELECT * FROM read_parquet('{d}/{f}')")
    tot, per, errs = 0.0, {}, {}
    for name, sql in sqls.items():
        timer = threading.Timer(cap, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
            per[name] = round(dt, 3)
            tot += dt
        except Exception as e:  # OOM, interrupt (cap), SQL feature gap
            dt = time.time() - t0
            errs[name] = {"after_s": round(dt, 1),
                          "error": f"{type(e).__name__}: {e}"[:200]}
            print(f"[duck] {name} FAILED after {dt:.1f}s: "
                  f"{type(e).__name__}", file=sys.stderr)
        finally:
            timer.cancel()
        json.dump({"per": per, "errors": errs}, open(out, "w"))
    print(json.dumps({"total": round(tot, 1), "n_ok": len(per),
                      "n_err": len(errs), "dir": d}))
    print(sorted(per.items(), key=lambda x: -x[1])[:8])
    if errs:
        print("errors:", list(errs))


if __name__ == "__main__":
    main()
