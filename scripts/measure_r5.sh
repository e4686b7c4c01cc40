#!/bin/bash
# Round-5 measurement sweep (VERDICT r4 items 2,4,5,6,7).
#
# ORDER MATTERS: bench.py runs FIRST so a driver-format artifact exists
# even if the tunnel window closes mid-sweep (both r03 and r04 lost the
# window before the harness leg).  Then the A/B knob adjudication legs,
# then validation (incl. the round-4 TPU-unvalidated collider kernels),
# then profiles/microbenches, then the end-to-end reference workload.
#
# Every leg is timeout-bounded; each leg's client exits before the next
# connects (tunnel hygiene, scripts/probe_tpu.py docstring).
set -u
cd "$(dirname "$0")/.."
STAMP=$(date +%Y%m%d_%H%M)
LOG=${LOG:-docs/measurements/r5_measure_${STAMP}.log}
PY=${PY:-python}
FROM=${MEASURE_FROM:-0}
LEG=0
mkdir -p docs/measurements
echo "==== measure_r5 $(date -Is) commit $(git rev-parse --short HEAD) from=$FROM" | tee -a "$LOG"

run() {
  LEG=$((LEG + 1))
  if [ "$LEG" -le "$FROM" ]; then
    echo "---- [leg $LEG] $1 (SKIPPED, MEASURE_FROM=$FROM)" | tee -a "$LOG"
    shift
    return 0
  fi
  echo "---- [leg $LEG] $1 $(date -Is)" | tee -a "$LOG"
  local budget=$2
  shift 2
  timeout "$budget" "$@" 2>&1 | tail -16 | tee -a "$LOG"
  sleep 5
}

# -- driver-format artifacts first (VERDICT item 2 + 4) --------------
run "2D bench (default knobs) [headline]" 900 \
    env BENCH_2D_ONLY=1 "$PY" bench.py
run "3D full bench 8M/256^3 (default knobs) [headline]" 2700 \
    env BENCH_3D=1 "$PY" bench.py
# -- 2D knob adjudication (VERDICT item 2: default is now UNFUSED
#    per the r4 1152 log; these legs complete the 2x2 fused x crop
#    matrix plus the run-loop structure candidate) -------------------
run "2D bench MPM_P2G_GRID=1 (fused rolling-scratch)" 900 \
    env BENCH_2D_ONLY=1 MPM_P2G_GRID=1 "$PY" bench.py
run "2D bench MPM_GCROP=0 (unfused, uncropped)" 900 \
    env BENCH_2D_ONLY=1 MPM_GCROP=0 "$PY" bench.py
run "2D bench MPM_P2G_GRID=1 MPM_GCROP=0 (fused, uncropped)" 900 \
    env BENCH_2D_ONLY=1 MPM_P2G_GRID=1 MPM_GCROP=0 "$PY" bench.py
run "2D bench MPM_RUN_WHILE=1 (cond-free hot body)" 900 \
    env BENCH_2D_ONLY=1 MPM_RUN_WHILE=1 "$PY" bench.py
run "2D bench MPM_FUSE2D_G2P=1" 900 \
    env BENCH_2D_ONLY=1 MPM_FUSE2D_G2P=1 "$PY" bench.py
run "2D bench MPM_KC2D=2048" 900 \
    env BENCH_2D_ONLY=1 MPM_KC2D=2048 "$PY" bench.py
run "2D bench MPM_KC2D=512" 900 \
    env BENCH_2D_ONLY=1 MPM_KC2D=512 "$PY" bench.py
# -- 3D knob A/B (VERDICT item 4) ------------------------------------
run "3D full bench MPM_KC3D=1024" 2700 \
    env BENCH_3D=1 MPM_KC3D=1024 "$PY" bench.py
run "3D small bench 1M/128^3" 1200 \
    env BENCH_3D=1 BENCH_3D_SMALL=1 "$PY" bench.py
# -- validation: round-4 TPU-unvalidated kernels (VERDICT item 6) ----
run "validation protocol (PoU, crop, colliders, taps, stability)" 2400 \
    env PYTHONPATH=.:/root/.axon_site "$PY" scripts/validate_dots.py
# -- profiles + gap analysis (VERDICT item 3) ------------------------
run "2D stage profile" 900 \
    env PYTHONPATH=.:/root/.axon_site "$PY" scripts/profile2d_loop.py
run "3D stage profile" 1500 \
    env PYTHONPATH=.:/root/.axon_site BENCH_3D_SMALL=1 "$PY" scripts/profile3d_loop.py
run "run-loop structure A/B (bare vs run() vs check)" 900 \
    env PYTHONPATH=.:/root/.axon_site "$PY" scripts/ab_run_cond.py
# -- lever gates (VERDICT items 5, 8) --------------------------------
run "bf16 VPU packing gate (ROADMAP lever 10)" 900 \
    env PYTHONPATH=.:/root/.axon_site "$PY" scripts/micro_bf16_vpu.py
# -- end-to-end reference workload (VERDICT item 7) ------------------
run "end-to-end 3 s / 3M substeps / 300 frames dam2d" 2400 \
    "$PY" -m mpm_flip98a_tpu --scenario dam2d --path fast \
    --frames 300 --substeps 10000 --out /tmp/endtoend_r5 --no-gif
echo "==== done $(date -Is)" | tee -a "$LOG"
