#!/bin/bash
# Round-3 staged TPU validation ladder (VERDICT.md round-2 item 1).
# Runs every stage serially via tpu_stage.sh; each stage logs to /tmp/r2_*.log
# and a combined status trail lands in /tmp/r3_ladder.status.
set -u
cd /root/repo
STATUS=/tmp/r3_ladder.status
: > "$STATUS"
for s in bench tests stress scaling suite; do
  echo "$(date -u +%FT%TZ) START $s" >> "$STATUS"
  bash benchmarks/dev/tpu_stage.sh "$s"
  rc=$?
  echo "$(date -u +%FT%TZ) DONE $s rc=$rc" >> "$STATUS"
done
echo "$(date -u +%FT%TZ) LADDER COMPLETE" >> "$STATUS"
