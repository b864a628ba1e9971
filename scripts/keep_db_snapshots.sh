#!/bin/bash
# Preserve every eval-epoch DB snapshot during a chunked retrain.
#
# The chunk driver (train_db_chunks.sh) overwrites db_last.ctd at each eval
# epoch; promotion gating (gate_candidate.sh) happens AFTER training stops
# (the gates force 8 virtual CPU devices and contend with the loader on
# this 1-CPU host).  This watcher copies db_last.ctd to db_last_ep<N>.ctd
# whenever the epoch advances so every candidate stays gateable.
#
# Usage: scripts/keep_db_snapshots.sh [workdir]   (default data/db_work_r5)
# Stops when /tmp/stop_db_training exists (same flag as the chunk driver).
set -u
cd "$(dirname "$0")/.."
WORK=${1:-data/db_work_r5}
LAST=-1
while [ ! -f /tmp/stop_db_training ]; do
  META="$WORK/db_last.ctd.meta.json"
  if [ -f "$META" ]; then
    EP=$(python -c "import json;print(json.load(open('$META')).get('epoch',-1))" 2>/dev/null || echo -1)
    if [ "$EP" != "$LAST" ] && [ "$EP" -ge 0 ] 2>/dev/null; then
      cp "$WORK/db_last.ctd" "$WORK/db_last_ep${EP}.ctd" 2>/dev/null && \
        cp "$META" "$WORK/db_last_ep${EP}.ctd.meta.json" 2>/dev/null && \
        echo "$(date +%H:%M:%S) kept epoch $EP"
      LAST=$EP
    fi
  fi
  sleep 60
done
echo "$(date +%H:%M:%S) stop flag found, watcher exiting"
