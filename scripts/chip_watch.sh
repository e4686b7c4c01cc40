#!/bin/bash
# Tunnel watcher: probe every PERIOD seconds; on the first ALIVE, run
# the round-5 measurement sweep (scripts/measure_r5.sh) exactly once,
# then drop back to liveness logging so later manual sweeps can claim
# the chip.  Start detached:
#   nohup bash scripts/chip_watch.sh >/tmp/chip_watch.log 2>&1 &
#   echo $! > /tmp/chip_watch.pid
# Stop with: kill $(cat /tmp/chip_watch.pid)
set -u
cd "$(dirname "$0")/.."
PERIOD=${PERIOD:-480}
SWEEP_DONE=/tmp/r5_sweep_done
while true; do
  if timeout 150 python scripts/probe_tpu.py 120 >/dev/null 2>&1; then
    echo "$(date -Is) ALIVE"
    if [ ! -e "$SWEEP_DONE" ]; then
      touch "$SWEEP_DONE"
      echo "$(date -Is) launching measure_r5 sweep"
      bash scripts/measure_r5.sh
      echo "$(date -Is) sweep finished rc=$?"
    fi
  else
    echo "$(date -Is) DEAD"
  fi
  sleep "$PERIOD"
done
