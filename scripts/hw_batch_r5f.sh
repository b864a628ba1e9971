#!/bin/bash
# Round-5 final hardware batch (r5f): record the round's shipping numbers
# after the DB retrain + headline change.
#   1. bench with shipping defaults — ONE run now yields BOTH streams
#      (mixed distinct-pages headline + homogeneous note; bench.py r5).
#   2. bench with the r5 candidate checkpoint (if promoted, this is the
#      same as 1 — kept as an explicit row while the default still points
#      elsewhere).
#   3. per-stage single-page profile + refine profile on the shipping ckpt.
# Run ONLY with training stopped and the host otherwise quiet.
set -u
cd "$(dirname "$0")/.."
TAG=${1:-f}
run() {
  local name=$1; shift
  echo "=== $(date +%H:%M:%S) $name ==="
  timeout 5400 "$@" > "data/${name}_r5${TAG}.log" 2>&1
  echo "rc=$? $(date +%H:%M:%S)"
}

run bench_full python bench.py
if [ -f data/flagship_r5.npz ] && [ "${CTD_SKIP_R5CKPT:-0}" != "1" ]; then
  CTD_BENCH_CKPT=data/flagship_r5.npz run bench_r5ckpt python bench.py
fi
run profile_page python scripts/profile_page.py
run profile_refine python scripts/profile_refine.py
echo "=== done $(date +%H:%M:%S) ==="
