#!/usr/bin/env python3
"""Round-start testdata audit.

The driver regenerates /root/testdata between rounds, and a silent change in
the parquet *physical* types broke the event family for a whole round
(round 5: ts flipped TIMESTAMP(NANOS) -> micros-NTZ; every s-query failed at
scan time and the bench laundered the failures as ~0.05 s timings).

This tool dumps, for every parquet file under each sf dir:
  - the full arrow schema (field name -> logical type string)
  - the parquet physical type + logical-type annotation per leaf column
  - row count
and diffs it against the committed manifest (TESTDATA_MANIFEST.json).

Usage:
  python3 tools/audit_testdata.py            # diff against manifest (exit 1 on drift)
  python3 tools/audit_testdata.py --write    # (re)write the manifest

Run `--write` only after a human has confirmed the new layout is intentional
and the suite is green against it.
"""
import argparse
import json
import os
import sys
import glob

import pyarrow.parquet as pq

ROOT = "/root/testdata"
MANIFEST = os.path.join(os.path.dirname(__file__), "..", "TESTDATA_MANIFEST.json")


def describe_file(path):
    pf = pq.ParquetFile(path)
    arrow = pf.schema_arrow
    parquet_schema = pf.schema  # ParquetSchema: leaf-level physical info
    leaves = []
    for i in range(len(parquet_schema)):
        col = parquet_schema.column(i)
        leaves.append({
            "path": col.path,
            "physical_type": col.physical_type,
            "logical_type": str(col.logical_type),
        })
    return {
        "rows": pf.metadata.num_rows,
        "arrow_schema": {name: str(arrow.field(name).type) for name in arrow.names},
        "leaves": leaves,
    }


def snapshot():
    snap = {}
    for sfdir in sorted(glob.glob(os.path.join(ROOT, "sf*"))):
        sf = os.path.basename(sfdir)
        snap[sf] = {}
        for f in sorted(glob.glob(os.path.join(sfdir, "*.parquet"))):
            snap[sf][os.path.basename(f)] = describe_file(f)
    return snap


def diff(old, new):
    """Return a list of human-readable drift lines; empty means clean."""
    out = []
    for sf in sorted(set(old) | set(new)):
        if sf not in old:
            out.append(f"NEW sf dir: {sf}")
            continue
        if sf not in new:
            out.append(f"MISSING sf dir: {sf}")
            continue
        o, n = old[sf], new[sf]
        for fname in sorted(set(o) | set(n)):
            if fname not in o:
                out.append(f"{sf}/{fname}: NEW file")
                continue
            if fname not in n:
                out.append(f"{sf}/{fname}: MISSING file")
                continue
            of, nf = o[fname], n[fname]
            if of["rows"] != nf["rows"]:
                out.append(f"{sf}/{fname}: rows {of['rows']} -> {nf['rows']}")
            for col in sorted(set(of["arrow_schema"]) | set(nf["arrow_schema"])):
                ot = of["arrow_schema"].get(col)
                nt = nf["arrow_schema"].get(col)
                if ot != nt:
                    out.append(f"{sf}/{fname}: column {col}: arrow type {ot} -> {nt}")
            oleaf = {l["path"]: l for l in of["leaves"]}
            nleaf = {l["path"]: l for l in nf["leaves"]}
            for p in sorted(set(oleaf) | set(nleaf)):
                ol, nl = oleaf.get(p), nleaf.get(p)
                if ol is None or nl is None:
                    out.append(f"{sf}/{fname}: leaf {p}: {'added' if ol is None else 'removed'}")
                elif (ol["physical_type"], ol["logical_type"]) != (nl["physical_type"], nl["logical_type"]):
                    out.append(
                        f"{sf}/{fname}: leaf {p}: physical {ol['physical_type']}/{ol['logical_type']}"
                        f" -> {nl['physical_type']}/{nl['logical_type']}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="(re)write the manifest")
    args = ap.parse_args()

    snap = snapshot()
    if args.write:
        with open(MANIFEST, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
            f.write("\n")
        nfiles = sum(len(v) for v in snap.values())
        print(f"wrote manifest: {len(snap)} sf dirs, {nfiles} files")
        return 0

    if not os.path.exists(MANIFEST):
        print("no manifest found — run with --write first", file=sys.stderr)
        return 2
    with open(MANIFEST) as f:
        old = json.load(f)
    drift = diff(old, snap)
    if drift:
        print("TESTDATA DRIFT DETECTED:")
        for line in drift:
            print("  " + line)
        return 1
    nfiles = sum(len(v) for v in snap.values())
    print(f"testdata matches manifest ({len(snap)} sf dirs, {nfiles} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
