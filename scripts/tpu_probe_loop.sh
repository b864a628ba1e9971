#!/bin/bash
# Probe the remote axon TPU with a tiny op every ~90 s until it answers.
# The service hangs hard at times (observed >5 h, CLAUDE.md round-3 facts);
# killing clients does not unwedge it — just wait and log.  Writes one line
# per attempt to the log given as $1 (default /tmp/tpu_probe.log) and exits 0
# on the first success so callers can chain the measurement batch after it.
set -u
LOG=${1:-/tmp/tpu_probe.log}
while true; do
  T0=$(date +%s)
  if timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
jnp.ones((8, 8)).sum().block_until_ready()
EOF
  then
    echo "$(date +%H:%M:%S) TPU ALIVE (probe $(( $(date +%s) - T0 ))s)" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) probe failed/timed out" >> "$LOG"
  sleep 90
done
