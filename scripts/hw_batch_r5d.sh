#!/bin/bash
# Round-5 follow-up batch (r5d): the three decisions r5c left open.
#   1. slots x2 default flip: r5c measured +11% same-batch (3.690 vs
#      3.248/3.340); one adjacent confirm before the default ships.
#   2. upload-coding A/B completion: r5c measured the mixed stream only in
#      raw mode (4.813) — the rowdelta default side ran pre-P-pad-fix code
#      and is retracted; measure it on the fixed stream.
#   3. VERDICT r4 item-1 fallback: a same-batch r3-code-state rerun
#      (worktree @ e92ea69, its own defaults incl. the flagship_r2 ckpt)
#      next to the current code on the same ckpt — if the two agree, the
#      gap to the 4.0959 r3 record is session drift, not regression.
# Run ONLY with training paused and the host otherwise quiet.
set -u
cd "$(dirname "$0")/.."
TAG=${1:-d}
run() {
  local name=$1; shift
  echo "=== $(date +%H:%M:%S) $name ==="
  timeout 3600 "$@" > "data/${name}_r5${TAG}.log" 2>&1
  echo "rc=$? $(date +%H:%M:%S)"
}

CTD_BENCH_MIXED2=0 run bench_homog python bench.py
CTD_REFINE_SLOTS_MULT=2 CTD_BENCH_MIXED2=0 run bench_slots2 python bench.py
CTD_BENCH_MIXED=1 run bench_mixed python bench.py
CTD_BENCH_CKPT=data/flagship_r2.npz CTD_BENCH_MIXED2=0 run bench_ckpt2 python bench.py

# r3 code state, its own defaults (= flagship_r2 ckpt), adjacent bracket
if [ ! -d .r3code ]; then
  git worktree add .r3code e92ea69 >/dev/null 2>&1 || true
fi
if [ -d .r3code ]; then
  echo "=== $(date +%H:%M:%S) bench_r3code ==="
  (cd .r3code && timeout 3600 python bench.py) \
    > "data/bench_r3code_r5${TAG}.log" 2>&1
  echo "rc=$? $(date +%H:%M:%S)"
fi
echo "=== done $(date +%H:%M:%S) ==="
