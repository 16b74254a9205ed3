#!/bin/bash
# One git-bisect step for the q50 regression: checkout $1 in the bisect
# worktree, compile, bench q50 min-of-5, write bench_out/ab_r14/q50_$1.json
set -u
SHA=$1
OUT=/root/repo/bench_out/ab_r14
cd /tmp/graft_bisect
git checkout -f -q "$SHA" || exit 1
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY=q50_leakage_split
export SPARK_GRAFT_BENCH_RUNS=5
export SPARK_GRAFT_BENCH_READERS=0
sbt -batch compile > "$OUT/compile_$SHA.log" 2>&1 || { echo "[bisect] $SHA compile FAILED"; exit 1; }
SPARK_GRAFT_BENCH_OUT="$OUT/q50_$SHA.json" sbt -batch "runMain graft.Bench" \
  >> "$OUT/run_q50_bisect.log" 2>&1
python3 -c "
import json
d=json.load(open('$OUT/q50_$SHA.json'))
s=d['samples_sec']['q50_leakage_split']
print('$SHA', 'min', min(s), s, 'load', round(d['system']['load_avg_before'],2))
"
