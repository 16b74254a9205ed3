#!/bin/bash
# q50 micro-bisect: HEAD vs HEAD-with-shingles-guard-reverted
# (/tmp/graft_bisect). Interleaved launches, min-of-5 each.
set -u
OUT=/root/repo/bench_out/ab_r14
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY=q50_leakage_split
export SPARK_GRAFT_BENCH_RUNS=5
export SPARK_GRAFT_BENCH_READERS=0

(cd /tmp/graft_bisect && sbt -batch compile) > "$OUT/compile_bisect.log" 2>&1 || { echo "[bisect] compile FAILED"; exit 1; }

for i in 1 2; do
  echo "[bisect] round $i HEAD     (load: $(cut -d' ' -f1 /proc/loadavg))"
  (cd /root/repo && SPARK_GRAFT_BENCH_OUT="$OUT/q50_head_$i.json" \
    sbt -batch "runMain graft.Bench") >> "$OUT/run_q50_head.log" 2>&1
  echo "[bisect] round $i noguard  (load: $(cut -d' ' -f1 /proc/loadavg))"
  (cd /tmp/graft_bisect && SPARK_GRAFT_BENCH_OUT="$OUT/q50_noguard_$i.json" \
    sbt -batch "runMain graft.Bench") >> "$OUT/run_q50_noguard.log" 2>&1
done
echo "[bisect] DONE"
