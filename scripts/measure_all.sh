#!/bin/bash
# One-shot TPU measurement sweep: every headline metric + the validation
# protocol, appended to $LOG (default /tmp/measure_all.log).  Run after
# kernel changes once a real chip is reachable.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/measure_all.log}
PY=${PY:-python}
# Resumability: MEASURE_FROM=N skips the first N legs (e.g. after a
# mid-sweep outage; leg indices are printed).  MEASURE_GATE=0 disables
# the upfront liveness gate.
FROM=${MEASURE_FROM:-0}
LEG=0
if [ "${MEASURE_GATE:-1}" = "1" ]; then
  if ! timeout 150 "$PY" scripts/probe_tpu.py 120 >/dev/null 2>&1; then
    echo "measure_all: device DEAD (probe timeout) — aborting sweep" | tee -a "$LOG"
    exit 1
  fi
fi
echo "==== measure_all $(date -Is) commit $(git rev-parse --short HEAD) from=$FROM" | tee -a "$LOG"

run() {
  LEG=$((LEG + 1))
  if [ "$LEG" -le "$FROM" ]; then
    echo "---- [leg $LEG] $1 (SKIPPED, MEASURE_FROM=$FROM)" | tee -a "$LOG"
    shift
    return 0
  fi
  echo "---- [leg $LEG] $1" | tee -a "$LOG"
  shift
  timeout 1500 "$@" 2>&1 | tail -12 | tee -a "$LOG"
  # Tunnel hygiene (see scripts/probe_tpu.py docstring): give the
  # previous client's teardown a moment before the next one connects.
  sleep 5
}

run "validation protocol (PoU, taps, 500-substep stability)" \
    env PYTHONPATH=.:/root/.axon_site "$PY" scripts/validate_dots.py
run "2D stage profile (p2g_grid path)" \
    env PYTHONPATH=.:/root/.axon_site "$PY" scripts/profile2d_loop.py
run "2D bench" env BENCH_2D_ONLY=1 "$PY" bench.py
run "2D bench (unfused A/B)" env BENCH_2D_ONLY=1 MPM_P2G_GRID=0 "$PY" bench.py
run "2D bench (fused G2P A/B)" env BENCH_2D_ONLY=1 MPM_FUSE2D_G2P=1 "$PY" bench.py
run "2D bench (KC=2048 A/B)" env BENCH_2D_ONLY=1 MPM_KC2D=2048 "$PY" bench.py
run "2D bench (uncropped 640-lane A/B)" env BENCH_2D_ONLY=1 MPM_GCROP=0 "$PY" bench.py
run "2D bench (KC=512 A/B)" env BENCH_2D_ONLY=1 MPM_KC2D=512 "$PY" bench.py
run "3D small bench" env BENCH_3D=1 BENCH_3D_SMALL=1 "$PY" bench.py
run "3D full bench (8M/256^3)" env BENCH_3D=1 "$PY" bench.py
run "3D full bench (KC A/B)" env BENCH_3D=1 MPM_KC3D=1024 "$PY" bench.py
run "3D stage profile" \
    env PYTHONPATH=.:/root/.axon_site BENCH_3D_SMALL=1 "$PY" scripts/profile3d_loop.py
run "bf16 VPU packing microbench (ROADMAP lever 10 gate)" \
    env PYTHONPATH=.:/root/.axon_site "$PY" scripts/micro_bf16_vpu.py
run "run-loop structure A/B (bare substep vs production run())" \
    env PYTHONPATH=.:/root/.axon_site "$PY" scripts/ab_run_cond.py
echo "---- end-to-end reference workload (3 s / 3M substeps / 300 frames)" | tee -a "$LOG"
timeout 2400 "$PY" -m mpm_flip98a_tpu --scenario dam2d --path fast \
    --frames 300 --substeps 10000 --out /tmp/endtoend_r4 --no-gif \
    2>&1 | tail -6 | tee -a "$LOG"
echo "==== done $(date -Is)" | tee -a "$LOG"
