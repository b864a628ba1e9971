#!/bin/bash
# Round-4 hardware measurement batch. Run ONLY with training paused (the
# remote TPU serializes programs; contention garbles every timing).
# Usage: scripts/hw_batch_r4.sh [tag]    (logs land in data/*_r4<tag>.log)
set -u
cd "$(dirname "$0")/.."
TAG=${1:-b}
run() {
  local name=$1; shift
  echo "=== $(date +%H:%M:%S) $name ==="
  timeout 3600 "$@" > "data/${name}_r4${TAG}.log" 2>&1
  echo "rc=$? $(date +%H:%M:%S)"
}
run cc_variant_ab python scripts/cc_variant_ab.py
run profile_refine python scripts/profile_refine.py
run profile_page python scripts/profile_page.py
run bench_homog python bench.py
CTD_BENCH_MIXED=1 run bench_mixed python bench.py
# the r2 checkpoint: pathological-density DB map, cross-round comparability
CTD_BENCH_CKPT=data/flagship_r2.npz run bench_ckpt2 python bench.py
run bench_sweep python scripts/bench_sweep.py
# fewer, fatter refine dispatches (device per-window work is invariant)
CTD_REFINE_SLOTS_MULT=2 run bench_slots2 python bench.py
echo "=== done $(date +%H:%M:%S) ==="
