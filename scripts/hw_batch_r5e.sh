#!/bin/bash
# r5e: upload-mode A/B on the HOMOG stream (the r5d r3code bracket showed
# r3-code 4.284 vs current-code 3.519 on the same ckpt same batch; rowdelta
# host-side encode is the prime suspect — it costs 1-CPU host time per page
# while homog uploads dedupe regardless). raw / rowdelta / raw bracket.
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $(date +%H:%M:%S) $name ==="
  timeout 3600 "$@" > "data/${name}_r5e.log" 2>&1
  echo "rc=$? $(date +%H:%M:%S)"
}
CTD_UPLOAD_MODE=raw CTD_BENCH_MIXED2=0 run bench_homog_raw1 python bench.py
CTD_BENCH_MIXED2=0 run bench_homog_rd python bench.py
CTD_UPLOAD_MODE=raw CTD_BENCH_MIXED2=0 run bench_homog_raw2 python bench.py
echo "=== done $(date +%H:%M:%S) ==="
