#!/bin/bash
# Window hunt for the two-level scaling protocol (BENCH/BASELINE.md).
# Serialized launches, alternating levels/modes, appending to the r05
# ledger. The min-per-level estimator only improves with more samples;
# every raw measurement is published. Kill with: touch BENCH/HUNT_STOP
cd /root/repo
LEDGER=BENCH/scaling_runs_r05.jsonl
run() { # mode n_execs [n_events]
  echo "[$(date -u +%H:%M:%S)] launch $1 ${2}x ${3:-64000000}"
  BENCH_MERGE_MODE=$1 python bench/scaling.py launch "$2" "${3:-64000000}" "$LEDGER" \
    >/dev/null 2>&1
}
cycle=0
while [ ! -f BENCH/HUNT_STOP ]; do
  cycle=$((cycle + 1))
  # graded-pair launches first (CoW 4-exec is the binding minimum),
  # curve levels (2, 8) every other cycle
  run cow 4; [ -f BENCH/HUNT_STOP ] && break
  run cow 1; [ -f BENCH/HUNT_STOP ] && break
  run mor 4; [ -f BENCH/HUNT_STOP ] && break
  run mor 1; [ -f BENCH/HUNT_STOP ] && break
  if [ $((cycle % 2)) -eq 1 ]; then
    run cow 2; [ -f BENCH/HUNT_STOP ] && break
    run cow 8; [ -f BENCH/HUNT_STOP ] && break
  fi
  # weak-scaling (Gustafson) points: 1 exec at 1/4 the events — equal
  # per-executor work vs the 4-exec 64M launches above
  run cow 1 16000000; [ -f BENCH/HUNT_STOP ] && break
  run mor 1 16000000
done
echo "[$(date -u +%H:%M:%S)] hunt stopped after $cycle cycle(s)"
