#!/bin/bash
# Post-fix re-bench: HEAD (codegen'd kernels) vs r12 tip on x32/q50.
set -u
OUT=/root/repo/bench_out/ab_r14
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY=x32_winnow_fast,q50_leakage_split
export SPARK_GRAFT_BENCH_RUNS=5
export SPARK_GRAFT_BENCH_READERS=0

(cd /root/repo && sbt -batch compile) > /dev/null 2>&1 || exit 1
for i in 1 2; do
  echo "[post] round $i HEAD (load: $(cut -d' ' -f1 /proc/loadavg))"
  (cd /root/repo && SPARK_GRAFT_BENCH_OUT="$OUT/post_head_$i.json" \
    sbt -batch "runMain graft.Bench") > /dev/null 2>&1
  echo "[post] round $i r12  (load: $(cut -d' ' -f1 /proc/loadavg))"
  (cd /tmp/graft_r12 && SPARK_GRAFT_BENCH_OUT="$OUT/post_r12_$i.json" \
    sbt -batch "runMain graft.Bench") > /dev/null 2>&1
done
for f in "$OUT"/post_*.json; do
  python3 -c "
import json
d=json.load(open('$f'))
s=d['samples_sec']
print('$f'.split('/')[-1], {k: v for k, v in s.items()})
"
done
