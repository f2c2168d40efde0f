#!/bin/bash
# Round-13 paired close-out chain (detached; evolves the r12 shape).
#
# New this round (VERDICT r12 ask #6): the 1x legs run as THREE
# INTERLEAVED Spark/DuckDB sweeps (S,D,S,D,S,D) collapsed to per-query
# medians by tools/pair_median.py — both engines sample the same box
# weather and no single sweep's ±15% variance moves the headline ratio.
# The 10x legs stay single sweeps (each is ~6-10 min; the 10x signal is
# GROWTH, which box variance barely touches).
#
# Prereqs (regenerate per boot, /tmp is wiped):
#   python3 tools/make_10x.py /root/testdata/sf0.1 /tmp/sf1_10x
#   a green Verify dump at /tmp/verify_r13_final (for oracle_sql.json)
set -x
cd /root/repo
ORACLES=/tmp/verify_r13_final/oracle_sql.json
date
python3 tools/audit_testdata.py || exit 1
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT=/tmp/r13_spark_1x_$i.json \
    sbt -batch 'runMain graft.Bench' > /tmp/r13_bench_1x_$i.log 2>&1
  date
  python3 tools/bench_duck.py /root/testdata/sf0.1 "$ORACLES" \
    /tmp/r13_duck_1x_$i.json > /tmp/r13_duck_1x_$i.log 2>&1
  date
done
python3 tools/pair_median.py /tmp/r13_spark_1x.json \
  /tmp/r13_spark_1x_1.json /tmp/r13_spark_1x_2.json /tmp/r13_spark_1x_3.json
python3 tools/pair_median.py /tmp/r13_duck_1x.json \
  /tmp/r13_duck_1x_1.json /tmp/r13_duck_1x_2.json /tmp/r13_duck_1x_3.json
date
SPARK_GRAFT_SF_DIR=/tmp/sf1_10x SPARK_GRAFT_BENCH_OUT=/tmp/r13_spark_10x.json \
  sbt -batch 'runMain graft.Bench' > /tmp/r13_bench_10x.log 2>&1
date
# DUCK_MEM_LIMIT: without it, t26's 10x query gets the process OOM-killed
# at ~130 GB RSS and every query after it is silently lost; with it,
# DuckDB raises and the DNF is recorded (t23/t26 are the expected two).
DUCK_MEM_LIMIT=100GB \
  python3 tools/bench_duck.py /tmp/sf1_10x "$ORACLES" /tmp/r13_duck_10x.json \
  > /tmp/r13_duck_10x.log 2>&1
date
python3 tools/make_bench_10x.py /tmp/r13_spark_1x.json /tmp/r13_spark_10x.json \
  /tmp/r13_duck_1x.json /tmp/r13_duck_10x.json BENCH_10X.json
cp /tmp/r13_spark_1x.json BENCH_REF.json
cp /tmp/r13_spark_1x.json BENCH_LAST.json
date
echo CLOSEOUT_DONE
