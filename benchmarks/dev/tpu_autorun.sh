#!/bin/bash
# Watch the TPU tunnel; on recovery, run the staged validation sequence.
# Logs: /tmp/tunnel_probes.log (probe history), /tmp/r2_*.log (stages).
# Stages honor the official-bench hold via tpu_stage.sh (see bench.py).
set -u
STAGE="$(dirname "$0")/tpu_stage.sh"
PROBE_LOG=/tmp/tunnel_probes.log
echo "=== autorun start $(date -u +%F' '%T) ===" >> "$PROBE_LOG"
while true; do
  if timeout 75 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "ALIVE $(date -u +%T)" >> "$PROBE_LOG"
    break
  fi
  echo "dead  $(date -u +%T)" >> "$PROBE_LOG"
  sleep 45
done
echo "=== tunnel recovered, staging at $(date -u +%T) ===" >> "$PROBE_LOG"
for stage in bench tests stress scaling suite; do
  echo "--- stage $stage start $(date -u +%T) ---" >> "$PROBE_LOG"
  bash "$STAGE" "$stage" >/dev/null 2>&1
  rc=$?
  echo "--- stage $stage done  $(date -u +%T) rc=$rc ---" >> "$PROBE_LOG"
done
touch /tmp/r2_stages_done
echo "=== all stages done $(date -u +%T) ===" >> "$PROBE_LOG"
