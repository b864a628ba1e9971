#!/bin/bash
# Chunked DB-head training driver.
#
# The axon client leaks ~34 MB of host memory per training step (the
# per-step upload size); a full 40-epoch run OOM-kills the process around
# epoch 13 (128 GB RSS).  This driver runs scripts/train_db_r3.py in short
# resumed chunks (CTD_DB_RESUME=1 + CTD_DB_EPOCHS_PER_RUN) so each process
# exits cleanly before the leak accumulates; prepared samples reload from
# the disk cache tier between chunks.
#
# Usage: scripts/train_db_chunks.sh [epochs_per_chunk] [deadline_epoch]
#   deadline_epoch: stop once db_last.ctd reaches this epoch (default 39).
# Stop early:      touch /tmp/stop_db_training
set -u
cd "$(dirname "$0")/.."
CHUNK=${1:-4}
DEADLINE=${2:-39}
# round-5: the script/work dir are parametrized so the same driver runs the
# r5 retrain (CTD_DB_SCRIPT=scripts/train_db_r5.py CTD_DB_WORK=data/db_work_r5)
SCRIPT=${CTD_DB_SCRIPT:-scripts/train_db_r3.py}
WORK=${CTD_DB_WORK:-data/db_work_r3}
LOG=${CTD_DB_LOG:-data/train_db_r3.log}
export CTD_DB_WORK="$WORK"

while true; do
  if [ -f /tmp/stop_db_training ]; then
    echo "$(date +%H:%M:%S) stop flag found, exiting" >> "$LOG"
    break
  fi
  EPOCH=$(WORK="$WORK" python - <<'EOF'
import json, os
p = os.path.join(os.environ["WORK"], "db_last.ctd.meta.json")
print(json.load(open(p)).get("epoch", -1) if os.path.exists(p) else -1)
EOF
)
  if [ "$EPOCH" -ge "$DEADLINE" ]; then
    echo "$(date +%H:%M:%S) reached epoch $EPOCH >= $DEADLINE, done" >> "$LOG"
    break
  fi
  echo "$(date +%H:%M:%S) chunk start from epoch $EPOCH (+$CHUNK)" >> "$LOG"
  # per-chunk wall cap: ~40 min/epoch under host load + compile headroom;
  # a hung remote TPU service otherwise wedges the driver forever
  timeout ${CTD_DB_CHUNK_TIMEOUT:-14400} env CTD_DB_RESUME=1 CTD_DB_EPOCHS_PER_RUN=$CHUNK \
    python "$SCRIPT" >> "$LOG" 2>&1
  rc=$?
  echo "$(date +%H:%M:%S) chunk exited rc=$rc" >> "$LOG"
  # rc!=0 (OOM-kill/compile hiccup) still resumes from the last saved ckpt;
  # bail only if NO progress is possible (no checkpoint at all yet).
  if [ ! -f "$WORK/db_last.ctd" ]; then
    echo "$(date +%H:%M:%S) no checkpoint exists; aborting driver" >> "$LOG"
    break
  fi
  sleep 5
done
