#!/usr/bin/env python3
"""Median-of-k combiner for paired bench sweeps.

Round 12's verdict flagged the ±15% box variance between back-to-back
sweeps as the largest error bar in the headline Spark-vs-DuckDB ratio
(207.8 vs 225.5 s Spark; 196.0 vs 221.5 s DuckDB across pairings). The
r13 protocol interleaves the two engines' 1x sweeps (S,D,S,D,S,D) so
both sample the same box weather, then this script collapses each
engine's k sweeps to a PER-QUERY MEDIAN artifact — the number a single
lucky or unlucky sweep cannot move.

Usage: tools/pair_median.py <out.json> <in1.json> [in2.json ...]

Inputs may be graft.Bench detail artifacts ({"queries": {name: s}, ...})
or bench_duck.py outputs ({"per": {name: s}, "errors": {...}}); all
inputs must be the same kind. The output carries the first input's
shape with per-query medians, a re-summed total, and (for bench_duck)
the union of recorded errors — a query that DNF'd in ANY sweep stays
visible.
"""
import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out_path, ins = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
    key = "per" if "per" in ins[0] else "queries"
    assert all(key in d for d in ins), \
        f"mixed artifact kinds: every input needs '{key}'"
    names = sorted(set().union(*[d[key].keys() for d in ins]))
    med = {}
    for n in names:
        vals = [d[key][n] for d in ins if n in d[key]]
        med[n] = round(statistics.median(vals), 3)
    out = dict(ins[0])
    out[key] = med
    if "value" in out:
        out["value"] = round(sum(med.values()), 3)
    if "total" in out:
        out["total"] = round(sum(med.values()), 3)
    if key == "per":
        errs = {}
        for d in ins:
            errs.update(d.get("errors", {}))
        out["errors"] = errs
    out["paired_sweeps"] = len(ins)
    json.dump(out, open(out_path, "w"))
    print(f"{out_path}: median of {len(ins)} sweeps over {len(names)} "
          f"queries, total {sum(med.values()):.1f}s")


if __name__ == "__main__":
    main()
