#!/bin/bash
# Round-12 paired close-out chain (detached; round-9/10/11 shape).
# Spark Bench sf0.1 -> bench_duck sf0.1 -> Spark Bench 10x -> bench_duck 10x
# -> make_bench_10x.py; then promote the 1x Spark artifact to
# BENCH_REF.json + BENCH_LAST.json.
set -x
cd /root/repo
ORACLES=/tmp/verify_r12_final/oracle_sql.json
date
python3 tools/audit_testdata.py || exit 1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/r12_spark_1x.json \
  sbt -batch 'runMain graft.Bench' > /tmp/r12_bench_1x.log 2>&1
date
python3 tools/bench_duck.py /root/testdata/sf0.1 "$ORACLES" /tmp/r12_duck_1x.json \
  > /tmp/r12_duck_1x.log 2>&1
date
SPARK_GRAFT_SF_DIR=/tmp/sf1_10x SPARK_GRAFT_BENCH_OUT=/tmp/r12_spark_10x.json \
  sbt -batch 'runMain graft.Bench' > /tmp/r12_bench_10x.log 2>&1
date
# DUCK_MEM_LIMIT: without it, t26's 10x query gets the process OOM-killed
# at ~130 GB RSS and every query after it is silently lost; with it,
# DuckDB raises and the DNF is recorded (t23/t26 are the expected two).
DUCK_MEM_LIMIT=100GB \
  python3 tools/bench_duck.py /tmp/sf1_10x "$ORACLES" /tmp/r12_duck_10x.json \
  > /tmp/r12_duck_10x.log 2>&1
date
python3 tools/make_bench_10x.py /tmp/r12_spark_1x.json /tmp/r12_spark_10x.json \
  /tmp/r12_duck_1x.json /tmp/r12_duck_10x.json BENCH_10X.json
cp /tmp/r12_spark_1x.json BENCH_REF.json
cp /tmp/r12_spark_1x.json BENCH_LAST.json
date
echo CLOSEOUT_DONE
