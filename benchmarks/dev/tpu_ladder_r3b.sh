#!/bin/bash
# Round-3 ladder, remaining stages (bench already recorded: best 9.10s,
# runs 22.58/13.48/9.10/18.40 — /tmp/r2_bench.log).  Restarted so the
# tests stage collects the fixed tree.
set -u
cd /root/repo
STATUS=/tmp/r3_ladder.status
for s in tests stress scaling suite; do
  echo "$(date -u +%FT%TZ) START $s (r3b)" >> "$STATUS"
  bash benchmarks/dev/tpu_stage.sh "$s"
  rc=$?
  echo "$(date -u +%FT%TZ) DONE $s rc=$rc" >> "$STATUS"
done
echo "$(date -u +%FT%TZ) LADDER r3b COMPLETE" >> "$STATUS"
