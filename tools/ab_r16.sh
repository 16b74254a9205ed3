#!/bin/bash
# Round-16 A/B (r15 verdict next #1): driver-official b09_vcf_split
# 2.40 s vs committed same-code 0.495 s. Same code both arms — the
# "arms" are FRESH JVM LAUNCHES: if any launch's min-of-5 sticks at the
# ~2.4 s mode the VCF INFO-projection parse path has a per-JVM sticky
# JIT mode (r13 class); if every launch holds ~0.5 s the driver sample
# was ambient. b04 rides along as the same-file control
# (Bench.scala promises b04 ~ b09).
set -u
OUT=/root/repo/bench_out/ab_r16
mkdir -p "$OUT"
cd /root/repo

export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY=b04_vcf_info,b09_vcf_split
export SPARK_GRAFT_BENCH_RUNS=5
export SPARK_GRAFT_BENCH_READER_RUNS=5

for i in 1 2 3 4 5 6; do
  echo "[ab] launch $i (load: $(cut -d' ' -f1 /proc/loadavg))" | tee -a "$OUT/launches.log"
  SPARK_GRAFT_BENCH_OUT="$OUT/launch_$i.json" \
    sbt -batch "runMain graft.Bench" >> "$OUT/run.log" 2>&1
  echo "[ab] launch $i done (load: $(cut -d' ' -f1 /proc/loadavg))" | tee -a "$OUT/launches.log"
done
echo "[ab] DONE"
