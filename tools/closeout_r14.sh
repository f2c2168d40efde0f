#!/bin/bash
# Round-14 paired close-out chain (detached; evolves the r13 shape).
#
# Same interleaved S,D,S,D,S,D 1x protocol as r13 (per-query medians via
# tools/pair_median.py, pinned in BASELINE.md). New this round (VERDICT
# r13 ask #6): the DuckDB 10x leg gets a spill directory + temp cap and
# a longer per-query cap so t23/t26 finish (or record a bounded DNF)
# instead of interrupting at 900 s / filling the root volume.
#
# Prereqs (regenerate per boot, /tmp is wiped):
#   python3 tools/make_10x.py /root/testdata/sf0.1 /tmp/sf1_10x
#   a green Verify dump at /tmp/verify_r14_final (for oracle_sql.json)
set -x
cd /root/repo
ORACLES=/tmp/verify_r14_final/oracle_sql.json
date
python3 tools/audit_testdata.py || exit 1
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT=/tmp/r14_spark_1x_$i.json \
    sbt -batch 'runMain graft.Bench' > /tmp/r14_bench_1x_$i.log 2>&1
  date
  python3 tools/bench_duck.py /root/testdata/sf0.1 "$ORACLES" \
    /tmp/r14_duck_1x_$i.json > /tmp/r14_duck_1x_$i.log 2>&1
  date
done
python3 tools/pair_median.py /tmp/r14_spark_1x.json \
  /tmp/r14_spark_1x_1.json /tmp/r14_spark_1x_2.json /tmp/r14_spark_1x_3.json
python3 tools/pair_median.py /tmp/r14_duck_1x.json \
  /tmp/r14_duck_1x_1.json /tmp/r14_duck_1x_2.json /tmp/r14_duck_1x_3.json
date
SPARK_GRAFT_SF_DIR=/tmp/sf1_10x SPARK_GRAFT_BENCH_OUT=/tmp/r14_spark_10x.json \
  sbt -batch 'runMain graft.Bench' > /tmp/r14_bench_10x.log 2>&1
date
# DUCK_MEM_LIMIT keeps the allocator under the box's 128 GiB;
# DUCK_TMP_DIR/DUCK_TMP_LIMIT route spill to /tmp with a hard cap (t26's
# r13 leg died filling the root volume via the default CWD/.tmp);
# DUCK_QUERY_CAP_S=2700 gives t23 room past its r13 933 s interrupt.
DUCK_MEM_LIMIT=100GB DUCK_TMP_DIR=/tmp/duck_spill DUCK_TMP_LIMIT=50GB \
  DUCK_QUERY_CAP_S=2700 \
  python3 tools/bench_duck.py /tmp/sf1_10x "$ORACLES" /tmp/r14_duck_10x.json \
  > /tmp/r14_duck_10x.log 2>&1
rm -rf /tmp/duck_spill
date
python3 tools/make_bench_10x.py /tmp/r14_spark_1x.json /tmp/r14_spark_10x.json \
  /tmp/r14_duck_1x.json /tmp/r14_duck_10x.json BENCH_10X.json
cp /tmp/r14_spark_1x.json BENCH_REF.json
cp /tmp/r14_spark_1x.json BENCH_LAST.json
date
echo CLOSEOUT_DONE
