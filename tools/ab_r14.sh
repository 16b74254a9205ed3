#!/bin/bash
# Round-14 interleaved A/B: HEAD vs r12 tip (d1b4fef) on the two
# un-adjudicated r13 regressions (x32_winnow_fast 1.72x, q50_leakage_split
# 1.29x). Same recipe that closed q20 in r13: alternating JVM launches so
# ambient drift hits both arms, min-of-5 within each launch, quiet machine.
set -u
OUT=/root/repo/bench_out/ab_r14
mkdir -p "$OUT"
cd /root/repo
git worktree add /tmp/graft_r12 d1b4fef 2>/dev/null || true

export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY=x32_winnow_fast,q50_leakage_split
export SPARK_GRAFT_BENCH_RUNS=5
export SPARK_GRAFT_BENCH_READERS=0

echo "[ab] compiling both arms..."
(cd /root/repo    && sbt -batch compile) > "$OUT/compile_head.log" 2>&1 || { echo "[ab] HEAD compile FAILED"; exit 1; }
(cd /tmp/graft_r12 && sbt -batch compile) > "$OUT/compile_r12.log" 2>&1 || { echo "[ab] r12 compile FAILED"; exit 1; }

for i in 1 2 3; do
  echo "[ab] round $i HEAD  (load: $(cut -d' ' -f1 /proc/loadavg))"
  (cd /root/repo && SPARK_GRAFT_BENCH_OUT="$OUT/head_$i.json" \
    sbt -batch "runMain graft.Bench") >> "$OUT/run_head.log" 2>&1
  echo "[ab] round $i r12   (load: $(cut -d' ' -f1 /proc/loadavg))"
  (cd /tmp/graft_r12 && SPARK_GRAFT_BENCH_OUT="$OUT/r12_$i.json" \
    sbt -batch "runMain graft.Bench") >> "$OUT/run_r12.log" 2>&1
done
echo "[ab] DONE"
