"""Resumable round-5 TPU measurement campaign.

The tunnel comes up in brief, unpredictable windows (the 15:50 window
on 2026-08-19 lasted ~4 minutes — one leg).  A linear sweep script
wastes windows re-running legs that already succeeded and hammers legs
into a dead tunnel.  This driver:

  - keeps an ordered leg list, HIGHEST VALUE FIRST (headline bench
    artifacts, then validation, then A/B knobs, then profiles);
  - records per-leg success in a state file and never re-runs a
    succeeded leg;
  - probes liveness (scripts/probe_tpu.py, which kills its own hung
    child) before each leg and aborts the pass after two consecutive
    failures — the next pass starts at the first undone leg;
  - appends everything to ONE log under docs/measurements/.

Run one pass:        python scripts/r5_campaign.py --once
Run until complete:  python scripts/r5_campaign.py        (probe loop)
Status:              python scripts/r5_campaign.py --status

The driver itself never imports jax (it must not claim the device);
every leg is a subprocess.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.path.join(ROOT, "docs", "measurements", "r5_state.json")
LOG = os.path.join(ROOT, "docs", "measurements", "r5_campaign.log")
PROBE_PERIOD = 480


def _now() -> str:
    return datetime.now(timezone.utc).isoformat(timespec="seconds")


def log(msg: str):
    line = f"{_now()} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def bench_ok(out: str):
    """Success = last JSON line has value > 0."""
    for line in reversed(out.strip().splitlines()):
        if line.startswith("{"):
            try:
                v = json.loads(line)
            except json.JSONDecodeError:
                continue
            if v.get("value", 0) > 0:
                return True, f"value={v['value']:.4g}"
            return False, str(v.get("detail", {}).get("errors", ""))[:200]
    return False, "no JSON line"


def rc_ok(expect: str = None):
    def check(out: str, rc: int = 0):
        if rc != 0:
            return False, f"rc={rc}"
        if expect and expect not in out:
            return False, f"missing {expect!r}"
        return True, "ok"

    return check


PYPATH = {"PYTHONPATH": ".:/root/.axon_site"}
B2 = {"BENCH_2D_ONLY": "1", "BENCH_GATE_S": "300"}
B3 = {"BENCH_3D": "1", "BENCH_GATE_S": "300"}

# (name, env, argv, budget_s, kind) — kind: "bench" | ("rc", expect)
LEGS = [
    # headline driver-format artifacts first
    ("2d_default", B2, ["python", "bench.py"], 900, "bench"),
    ("3d_full", B3, ["python", "bench.py"], 2700, "bench"),
    # on-chip validation of the round-4 TPU-unvalidated kernels
    ("validate", PYPATH, ["python", "scripts/validate_dots.py"], 2400,
     ("rc", "RESULT")),
    # 2D knob adjudication (fused x crop matrix + run-loop structure)
    ("2d_fused", {**B2, "MPM_P2G_GRID": "1"}, ["python", "bench.py"], 900,
     "bench"),
    ("2d_runwhile", {**B2, "MPM_RUN_WHILE": "1"}, ["python", "bench.py"],
     900, "bench"),
    ("2d_uncropped", {**B2, "MPM_GCROP": "0"}, ["python", "bench.py"], 900,
     "bench"),
    ("2d_fused_uncropped", {**B2, "MPM_P2G_GRID": "1", "MPM_GCROP": "0"},
     ["python", "bench.py"], 900, "bench"),
    # 3D A/B + small scale
    ("3d_kc1024", {**B3, "MPM_KC3D": "1024"}, ["python", "bench.py"], 2700,
     "bench"),
    ("3d_small", {**B3, "BENCH_3D_SMALL": "1"}, ["python", "bench.py"],
     1200, "bench"),
    # gap analysis + profiles
    ("ab_run_cond", PYPATH, ["python", "scripts/ab_run_cond.py"], 1500,
     ("rc", "D while")),
    ("profile2d", PYPATH, ["python", "scripts/profile2d_loop.py"], 900,
     ("rc", "full substep")),
    ("profile3d", {**PYPATH, "BENCH_3D_SMALL": "1"},
     ["python", "scripts/profile3d_loop.py"], 1500, ("rc", "full substep")),
    # lever gate
    ("bf16_gate", PYPATH, ["python", "scripts/micro_bf16_vpu.py"], 900,
     ("rc", None)),
    # remaining 2D knob legs
    ("2d_fuse_g2p", {**B2, "MPM_FUSE2D_G2P": "1"}, ["python", "bench.py"],
     900, "bench"),
    ("2d_kc2048", {**B2, "MPM_KC2D": "2048"}, ["python", "bench.py"], 900,
     "bench"),
    ("2d_kc512", {**B2, "MPM_KC2D": "512"}, ["python", "bench.py"], 900,
     "bench"),
    # end-to-end reference workload (also the CLI verify surface)
    ("endtoend_2d", {}, ["python", "-m", "mpm_flip98a_tpu", "--scenario",
     "dam2d", "--path", "fast", "--frames", "300", "--substeps", "10000",
     "--out", "/tmp/endtoend_r5", "--no-gif"], 2400, ("rc", "Run Time")),
    ("cli_3d_ckpt", {}, ["python", "-m", "mpm_flip98a_tpu", "--scenario",
     "dam3d", "--path", "fast", "--frames", "2", "--substeps", "20",
     "--out", "/tmp/v3d_r5", "--checkpoint", "/tmp/v3d_r5/ck", "--no-gif"],
     1500, ("rc", "Run Time")),
    ("cli_3d_resume", {}, ["python", "-m", "mpm_flip98a_tpu", "--scenario",
     "dam3d", "--path", "fast", "--frames", "2", "--substeps", "20",
     "--out", "/tmp/v3d_r5b", "--resume", "/tmp/v3d_r5/ck", "--no-gif"],
     1500, ("rc", "Run Time")),
    # obstacle scenarios on chip (VERDICT item 6)
    ("cli_obstacle2d", {}, ["python", "-m", "mpm_flip98a_tpu", "--scenario",
     "dam2d_obstacle", "--path", "fast", "--frames", "3", "--substeps",
     "200", "--out", "/tmp/obst2d_r5", "--no-gif"], 1500,
     ("rc", "Run Time")),
    ("cli_obstacle3d", {}, ["python", "-m", "mpm_flip98a_tpu", "--scenario",
     "dam3d_obstacle", "--path", "fast", "--frames", "2", "--substeps",
     "50", "--out", "/tmp/obst3d_r5", "--no-gif"], 1500, ("rc", "Run Time")),
]


def load_state() -> dict:
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {"done": {}}


def save_state(st: dict):
    with open(STATE, "w") as f:
        json.dump(st, f, indent=1)


def probe_alive(deadline=120) -> bool:
    r = subprocess.run(
        [sys.executable, "scripts/probe_tpu.py", str(deadline)],
        cwd=ROOT, capture_output=True, timeout=deadline + 60,
    )
    return r.returncode == 0


def run_leg(name, env, argv, budget, kind) -> tuple[bool, str, bool]:
    """Returns (ok, summary, device_failure)."""
    log(f"LEG {name} start (budget {budget}s): {' '.join(argv)}")
    full_env = {**os.environ, **env}
    try:
        r = subprocess.run(
            argv, cwd=ROOT, env=full_env, capture_output=True, text=True,
            timeout=budget,
        )
        out = (r.stdout or "") + (r.stderr or "")
        rc = r.returncode
        timed_out = False
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace")
               if isinstance(e.stdout, bytes) else (e.stdout or ""))
        rc = -1
        timed_out = True
    tail = "\n".join(out.strip().splitlines()[-14:])
    with open(LOG, "a") as f:
        f.write(tail + "\n")
    if timed_out:
        log(f"LEG {name} TIMEOUT after {budget}s")
        return False, "timeout", True
    if kind == "bench":
        ok, summary = bench_ok(out)
        dev_fail = (not ok) and ("device" in summary or "watchdog" in summary
                                 or summary == "no JSON line")
    else:
        _, expect = kind
        ok, summary = rc_ok(expect)(out, rc)
        dev_fail = not ok
    log(f"LEG {name} {'OK' if ok else 'FAIL'}: {summary}")
    return ok, summary, dev_fail


def one_pass(st: dict) -> bool:
    """Run undone legs until two consecutive device failures.
    Returns True if all legs are done."""
    consec = 0
    for name, env, argv, budget, kind in LEGS:
        if name in st["done"]:
            continue
        if consec >= 2:
            log("pass aborted: 2 consecutive device failures")
            return False
        if not probe_alive():
            log(f"probe DEAD before leg {name}; pass ends")
            return False
        time.sleep(8)  # teardown hygiene between clients
        ok, summary, dev_fail = run_leg(name, env, argv, budget, kind)
        if ok:
            st["done"][name] = {"ts": _now(), "summary": summary}
            save_state(st)
            consec = 0
        elif dev_fail:
            consec += 1
        time.sleep(8)
    return all(n in st["done"] for n, *_ in LEGS)


def main():
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    st = load_state()
    if "--status" in sys.argv:
        for name, *_ in LEGS:
            mark = st["done"].get(name)
            print(f"{'DONE' if mark else '....'} {name}"
                  + (f"  {mark['summary']}" if mark else ""))
        return
    if "--once" in sys.argv:
        done = one_pass(st)
        log(f"pass complete; all_done={done}")
        return
    while True:
        if all(n in st["done"] for n, *_ in LEGS):
            log("ALL LEGS DONE")
            return
        if probe_alive():
            one_pass(st)
        else:
            log("probe DEAD; sleeping")
        time.sleep(PROBE_PERIOD)


if __name__ == "__main__":
    main()
