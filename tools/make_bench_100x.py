#!/usr/bin/env python3
"""Assemble BENCH_100X.json — the 100x partial-sweep scale probe
(round 15, VERDICT r14 ask #7).

The 100 TB posture argument rested on 10x extrapolation; this artifact
extends it two orders of magnitude for the HEAVY families (streaming
s01-s26, the similarity joins t23/t26, ANN e06/e13, q52_skew_join): a
single Spark sweep over a 100x key-shifted replica (tools/make_10x.py
with copies=100), growth ratios against the 1x per-query medians.
A query is flagged superlinear when its 100x time exceeds 100x its 1x
time — growth per input row.

Usage: tools/make_bench_100x.py <spark_1x_median.json> \
         <spark_100x.json> [out=BENCH_100X.json]
"""
import json
import sys


def main() -> None:
    s1 = json.load(open(sys.argv[1]))
    s100 = json.load(open(sys.argv[2]))
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_100X.json"
    q1, q100 = s1["queries"], s100["queries"]
    names = sorted(set(q1) & set(q100))
    per = {}
    for n in names:
        growth = round(q100[n] / q1[n], 2) if q1[n] > 0 else None
        per[n] = {"spark_1x": q1[n], "spark_100x": q100[n],
                  "spark_growth_100x": growth}
    superlinear = sorted(
        (n for n in names if per[n]["spark_growth_100x"] and
         per[n]["spark_growth_100x"] > 100.0),
        key=lambda n: -per[n]["spark_growth_100x"])
    artifact = {
        "suite": {
            "n_queries": len(names),
            "spark_1x_total": round(sum(q1[n] for n in names), 1),
            "spark_100x_total": round(sum(q100[n] for n in names), 1),
            "note": ("partial sweep: heavy families only (s01-s26, "
                     "t23/t26, e06/e13, q52) on a 100x key-shifted "
                     "replica; single sweep — the signal is the "
                     "100x/1x growth ratio"),
        },
        "yardsticks": {"spark_100x": s100.get("yardsticks")},
        "errors": {"spark_100x": s100.get("errors")},
        "superlinear_spark_100x": superlinear,
        "queries": per,
    }
    su = artifact["suite"]
    su["spark_suite_growth_100x"] = round(
        su["spark_100x_total"] / su["spark_1x_total"], 2)
    json.dump(artifact, open(out, "w"), indent=1)
    print(json.dumps(su, indent=1))
    print("superlinear (spark growth > 100x):", superlinear)
    worst = sorted(names, key=lambda n: -per[n]["spark_100x"])[:10]
    for n in worst:
        p = per[n]
        print(f"  {n}: 100x {p['spark_100x']}s "
              f"(x{p['spark_growth_100x']})")


if __name__ == "__main__":
    main()
