#!/bin/bash
# Full promotion gate for a candidate flagship checkpoint (CPU-only; run on
# a quiet host — the parity suite forces 8 virtual CPU devices).
#
#   scripts/gate_candidate.sh data/flagship_r5.npz [tag]
#
# Order is cheapest-first so a failing candidate exits early:
#   1. check_speck_hazard  — bright-page confident-line storm (r5 gate)
#   2. eval_db_quality     — example-page block count + hazards
#   3. check_pad_hazard    — torch export + reference seg_rep pad firing
#   4. parity suite        — CTD_PARITY_CKPT cross-framework goldens
# All output lands in data/gate_<tag>.log; exit 0 = promotable.
set -u
cd "$(dirname "$0")/.."
CKPT=${1:?usage: gate_candidate.sh <ckpt.npz> [tag]}
TAG=${2:-$(basename "$CKPT" .npz)}
LOG="data/gate_${TAG}.log"
: > "$LOG"
rc_all=0
step() {
  local name=$1; shift
  echo "=== $(date +%H:%M:%S) $name ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ---" >> "$LOG"
  if [ $rc -ne 0 ]; then rc_all=1; fi
  return $rc
}
step speck_hazard python scripts/check_speck_hazard.py "$CKPT" || exit 1
step eval_db_quality python scripts/eval_db_quality.py "$CKPT" || exit 1
step pad_hazard python scripts/check_pad_hazard.py "$CKPT" || exit 1
step parity env CTD_PARITY_CKPT="$CKPT" \
  python -m pytest tests/test_flagship_parity.py -q
echo "=== gate_candidate $CKPT overall rc=$rc_all ===" >> "$LOG"
exit $rc_all
