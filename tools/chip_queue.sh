#!/bin/bash
# On-chip measurement queue: runs every pending A/B probe when the tunneled
# TPU backend is up. Each entry is independent; rc + timing logged. Safe to
# re-run (results are append-logged, programs persistently cached).
set -u
cd "$(dirname "$0")/.."
LOG=${CHIP_LOG:-/tmp/chip_run.log}
echo "=== chip queue start $(date -u +%F\ %T) ===" >> "$LOG"

run() {
  name=$1; shift
  echo "--- $name: $* ($(date -u +%T)) ---" >> "$LOG"
  t0=$SECONDS
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? dt=$((SECONDS-t0))s ---" >> "$LOG"
}

# 1. headline bench re-verify (evidence chain)
run bench python bench.py
# 2. fused tower-block halves A/B (ROUND3_NOTES item 3 pending)
run fused_block python tools/profile_fused_block.py
# 3. int8 MXU probe (decide clip.quant=int8 fate)
run int8 python tools/bench_int8_mxu.py
# 4. one-hot cache kernel A/B
run onehot python tools/bench_onehot_kernel.py
# 5. flash decode shapes (KERNELS.md decision record)
run flash python tools/bench_flash_gpt.py
# 6. decode variants incl. weight-only quant
run generate python tools/bench_generate.py
# 7. serving engine A/B
run serving python tools/bench_serving.py

echo "=== chip queue done $(date -u +%F\ %T) ===" >> "$LOG"
