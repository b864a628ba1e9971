#!/bin/bash
# Gate every kept r5 DB snapshot (CPU): assemble each db_last_ep<N>.ctd onto
# the flagship trunk and run the cheap speck-hazard gate, printing a table
# of epoch / val F1 (from the training log) / speck verdict.  The best
# F1 candidate that passes speck then goes through the FULL promotion gate
# (scripts/gate_candidate.sh: speck + eval + pad + parity).
#
# Round-4 lesson: picking the best-val-F1 snapshot without gating shipped a
# pad-hazard head; round-5 adds the speck gate for the bright-page storm
# (data/parity_r4_r5.log).  Usage: scripts/gate_snapshots_r5.sh [workdir]
set -u
cd "$(dirname "$0")/.."
WORK=${1:-data/db_work_r5}
LOG=${CTD_GATE_LOG:-data/gate_snapshots_r5.log}
TRAINLOG=${CTD_TRAIN_LOG:-data/train_db_r5.log}
: > "$LOG"
for ctd in "$WORK"/db_last_ep*.ctd "$WORK"/db_best.ctd; do
  [ -f "$ctd" ] || continue
  name=$(basename "$ctd" .ctd)
  ep=$(python -c "import json;print(json.load(open('$ctd.meta.json')).get('epoch','?'))" 2>/dev/null || echo '?')
  f1=$(grep -oP "^epoch ${ep}: .*F1 \K[0-9.]+" "$TRAINLOG" | tail -1)
  out="/tmp/cand_${name}.npz"
  CTD_DB_OUT="$out" python scripts/assemble_flagship_r3.py "$ctd" >> "$LOG" 2>&1
  if python scripts/check_speck_hazard.py "$out" >> "$LOG" 2>&1; then
    verdict=OK
  else
    verdict=SPECK
  fi
  echo "epoch $ep ($name): val F1 ${f1:-?}  speck=$verdict" | tee -a "$LOG"
done
echo "table done; run scripts/gate_candidate.sh on the chosen candidate" | tee -a "$LOG"
