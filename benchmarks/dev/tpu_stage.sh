#!/bin/bash
# One TPU validation/benchmark stage per invocation:
#   tpu_stage.sh {bench|suite|scaling|tests|stress}
#
# Development-host protocol (see bench.py): every TPU command runs in its
# own session (setsid) with ILLICO_TPU_BG=1, its process-group id recorded
# in /tmp/illico_tpu_bg.pgid so an official driver bench can preempt it,
# and starts only while /tmp/illico_tpu_hold is absent or stale (>45 min).
set -u
cd /root/repo

hold_wait() {
  while [ -f /tmp/illico_tpu_hold ]; do
    local age=$(( $(date +%s) - $(stat -c %Y /tmp/illico_tpu_hold) ))
    [ "$age" -ge 2700 ] && break
    sleep 60
  done
}

run_bg() { # run_bg <logfile> <cmd...>
  local log="$1"; shift
  hold_wait
  # setsid may fork (when already a group leader), so the pgid must be
  # recorded from INSIDE the new session; -w keeps this call synchronous.
  setsid -w bash -c 'echo $$ > /tmp/illico_tpu_bg.pgid; exec "$@"' _ \
    env ILLICO_TPU_BG=1 "$@" > "$log" 2>&1
  local rc=$?
  rm -f /tmp/illico_tpu_bg.pgid
  return $rc
}

case "$1" in
  bench)   run_bg /tmp/r2_bench.log   timeout 1500 python bench.py ;;
  qbench)  run_bg /tmp/r3_qbench.log  timeout 590 python bench.py --quick ;;
  hostwire) run_bg /tmp/r3_hostwire.log \
             timeout 2400 python benchmarks/host_wire_bench.py ;;
  suite)   run_bg /tmp/r2_suite.log   timeout 4500 python benchmarks/run_benchmarks.py ;;
  scaling) run_bg /tmp/r2_scaling.log timeout 4500 python benchmarks/scaling_study.py --runs 3 ;;
  # Measured 2026-08-19: the TPU-backend suite runs ~2.7 tests/min over the
  # remote-compile tunnel (first pass; disk-cached compiles speed reruns) —
  # the full ~350 tests need ~2.5 h, not the 50 min first guessed.
  tests)   run_bg /tmp/r2_tests.log   env ILLICO_TPU_TEST_TPU=1 \
             timeout 10800 python -m pytest tests/ -q ;;
  stress)  run_bg /tmp/r2_stress.log  env ILLICO_TPU_TEST_TPU=1 \
             timeout 3600 python -m pytest -m tpu_stress -q -s ;;
  *) echo "unknown stage: $1" >&2; exit 2 ;;
esac
