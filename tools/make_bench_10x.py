#!/usr/bin/env python3
"""Assemble BENCH_10X.json — the full-suite 10x paired-scale artifact.

Inputs: the Bench detail JSONs of the sf0.1 and 10x Spark runs (min-of-
sweeps per query, yardsticks in-artifact) and the two bench_duck.py
outputs on the same oracle set. Output: one artifact with, per query,
spark/duck seconds at both scales and the 10x/1x growth ratios, plus
suite totals and the scale-health summary the 100 TB posture argument
rests on (which queries grow super-linearly per input row, i.e.
ratio > 10 for a 10x corpus).

Usage: tools/make_bench_10x.py <spark_1x.json> <spark_10x.json> \
         <duck_1x.json> <duck_10x.json> [out=BENCH_10X.json] \
         [duck_3x.json]

The optional duck_3x.json (round 15, VERDICT r14 ask #4) is a bench_duck
run on a 3x replica restricted to the queries whose 10x DuckDB leg DNF'd
under the pinned envelope (t23/t26: both exhausted the 50 GB spill cap).
For those queries the artifact records the MEASURED 3x growth ratio
(duck_3x / duck_1x) with an explicit fallback annotation — every query
then carries a measured duck growth ratio at SOME scale, none are left
unmeasured.
"""
import json
import sys


def _duck(path):
    """bench_duck output: flat {name: s} (legacy) or {per, errors}."""
    d = json.load(open(path))
    if "per" in d:
        return d["per"], d.get("errors", {})
    return d, {}


def main() -> None:
    s1, s10 = (json.load(open(p)) for p in sys.argv[1:3])
    (d1, d1err), (d10, d10err) = (_duck(p) for p in sys.argv[3:5])
    out = sys.argv[5] if len(sys.argv) > 5 else "BENCH_10X.json"
    d3, d3err = _duck(sys.argv[6]) if len(sys.argv) > 6 else ({}, {})
    q1, q10 = s1["queries"], s10["queries"]
    names = sorted(set(q1) & set(q10))
    per = {}
    for n in names:
        growth = round(q10[n] / q1[n], 2) if q1[n] > 0 else None
        per[n] = {
            "spark_1x": q1[n], "spark_10x": q10[n], "spark_growth": growth,
            "duck_1x": d1.get(n), "duck_10x": d10.get(n),
        }
        if d1.get(n) and d10.get(n):
            per[n]["duck_growth"] = round(d10[n] / d1[n], 2)
        if d10.get(n):
            per[n]["ratio_10x"] = round(q10[n] / d10[n], 2)
        # 3x fallback: a measured duck growth for 10x-DNF queries
        if d1.get(n) and not d10.get(n) and d3.get(n):
            per[n]["duck_3x"] = d3[n]
            per[n]["duck_growth_3x"] = round(d3[n] / d1[n], 2)
            per[n]["duck_growth_fallback"] = (
                "3x replica (10x leg DNF under the pinned "
                "100GB/50GB-spill/2700s envelope)")
    superlinear = sorted(
        (n for n in names if per[n]["spark_growth"] and
         per[n]["spark_growth"] > 10.0),
        key=lambda n: -per[n]["spark_growth"])
    artifact = {
        "suite": {
            "n_queries": len(names),
            "spark_1x_total": round(sum(q1[n] for n in names), 1),
            "spark_10x_total": round(sum(q10[n] for n in names), 1),
            "duck_1x_total": round(
                sum(d1[n] for n in names if n in d1), 1),
            "duck_10x_total": round(
                sum(d10[n] for n in names if n in d10), 1),
        },
        "yardsticks": {"spark_1x": s1.get("yardsticks"),
                       "spark_10x": s10.get("yardsticks")},
        "errors": {"spark_1x": s1.get("errors"),
                   "spark_10x": s10.get("errors"),
                   "duck_1x": d1err, "duck_10x": d10err},
        "superlinear_spark": superlinear,
        "queries": per,
    }
    su = artifact["suite"]
    su["spark_vs_duck_10x"] = round(
        su["spark_10x_total"] / su["duck_10x_total"], 2)
    su["spark_suite_growth"] = round(
        su["spark_10x_total"] / su["spark_1x_total"], 2)
    su["duck_suite_growth"] = round(
        su["duck_10x_total"] / su["duck_1x_total"], 2)
    json.dump(artifact, open(out, "w"), indent=1)
    print(json.dumps(su, indent=1))
    print("superlinear (spark growth > 10x):", superlinear)
    worst = sorted(names, key=lambda n: -per[n]["spark_10x"])[:10]
    for n in worst:
        p = per[n]
        print(f"  {n}: 10x {p['spark_10x']}s (x{p['spark_growth']}), "
              f"duck {p.get('duck_10x')}s")


if __name__ == "__main__":
    main()
