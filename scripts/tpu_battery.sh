#!/bin/bash
# One-shot TPU measurement battery. Run in the FOREGROUND to completion
# (SIGTERM mid-step wedges the axon remote executor). Results land in
# EXP/tpu_battery_<ts>/.
set -u
ts=$(date -u +%Y%m%d_%H%M%S)
out=EXP/tpu_battery_$ts
# cd FIRST: $out is repo-relative, and every redirect below depends on it
cd "$(dirname "$0")/.."
mkdir -p "$out"

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a "$out/summary.txt"
  "$@" > "$out/$name.log" 2>&1
  echo "exit=$? ($(date -u +%H:%M:%S))" | tee -a "$out/summary.txt"
  tail -40 "$out/$name.log" | tee -a "$out/summary.txt"
}

# 0. Mosaic-compiled fused-kernel parity (CI only proves interpret mode)
run fused_check python scripts/tpu_fused_check.py

# 1. step profile incl. fused-MLP block sweep (the highest-signal run)
run profile python scripts/profile_step.py --iters 10

# 2. two-level listed-KNN sweep (sc, bf, bp, plan_p)
run sweep_knn python scripts/sweep_knn.py --listed --iters 20

# 3. bench A/Bs: baseline vs fused, and the KNN impl ladder
run bench_base python bench.py
run bench_fused env BENCH_FUSED=1 python bench.py
run bench_fused1024 env BENCH_FUSED=1 BENCH_FUSED_BLOCK=1024 python bench.py
run bench_fused2048 env BENCH_FUSED=1 BENCH_FUSED_BLOCK=2048 python bench.py
run bench_knn_pruned env BENCH_KNN=pruned python bench.py
run bench_fused_best env BENCH_FUSED=1 BENCH_FUSED_BLOCK=1024 BENCH_KNN=listed python bench.py

echo "battery done -> $out/summary.txt"
