#!/bin/bash
# Round-3 ladder, take 3: qbench validates the reworked bench.py schedule,
# then the full validation ladder with realistically-sized timeouts, the
# host-wire measurement, and a final full bench that also warms the OVR
# executables into the persistent compile cache for the driver's
# end-of-round run.
set -u
cd /root/repo
STATUS=/tmp/r3_ladder.status
for s in qbench tests stress scaling suite hostwire bench; do
  echo "$(date -u +%FT%TZ) START $s (r3c)" >> "$STATUS"
  bash benchmarks/dev/tpu_stage.sh "$s"
  rc=$?
  echo "$(date -u +%FT%TZ) DONE $s rc=$rc" >> "$STATUS"
done
echo "$(date -u +%FT%TZ) LADDER r3c COMPLETE" >> "$STATUS"
