#!/bin/bash
# After the staged validation finishes, sample the headline bench across
# link-phase windows (~every 75 min, 12 samples) to build the multi-window
# table BENCH_NOTES.md keeps.  Appends to /tmp/r2_periodic_bench.log.
# Samples honor the official-bench hold and record their pgid (bench.py).
set -u
LOG=/tmp/r2_periodic_bench.log
echo "=== periodic sampler started $(date -u +%F' '%T) ===" >> "$LOG"
while [ ! -f /tmp/r2_stages_done ]; do
  sleep 120
done
echo "=== stages done; sampling begins $(date -u +%F' '%T) ===" >> "$LOG"
for i in $(seq 1 12); do
  while [ -f /tmp/illico_tpu_hold ]; do
    age=$(( $(date +%s) - $(stat -c %Y /tmp/illico_tpu_hold) ))
    [ "$age" -ge 2700 ] && break
    sleep 60
  done
  echo "--- sample $i start $(date -u +%T) ---" >> "$LOG"
  cd /root/repo || exit 1
  setsid -w bash -c 'echo $$ > /tmp/illico_tpu_bg.pgid; exec "$@"' _ \
    env ILLICO_TPU_BG=1 timeout 1500 python bench.py >> "$LOG" 2>&1
  rc=$?
  rm -f /tmp/illico_tpu_bg.pgid
  echo "--- sample $i done $(date -u +%T) rc=$rc ---" >> "$LOG"
  sleep 4500
done
echo "=== periodic sampler done $(date -u +%F' '%T) ===" >> "$LOG"
