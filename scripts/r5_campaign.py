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
#
# ONE leg per tunnel window is the planning unit: measured 2026-08-19,
# the first client of a window claims fine and every shortly-following
# client tends to hang at claim (even after a clean predecessor exit,
# even after a trivial probe).  So the first leg is the ONE-CLIENT mega
# sweep (scripts/mega_measure.py): a single claim that measures every
# bench knob config, the validation protocol, the run-loop A/B, the
# profiles, and the bf16 gate, with per-stage resume state of its own.
# The CLI legs stay separate processes (they ARE the CLI surface) and
# each one may need its own window.
LEGS = [
    ("mega", {**PYPATH, "BENCH_GATE_S": "300"},
     ["python", "scripts/mega_measure.py"], 10800, ("rc", "MEGA DONE")),
    # one clean driver-format artifact on default knobs
    ("2d_bench_artifact", B2, ["python", "bench.py"], 900, "bench"),
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
    # chunk-cap x while-loop combination (ROADMAP lever 15): kc2048 won
    # under the fori loop (3.026e9 vs 2.910e9); if it replicates on the
    # round-5 while-loop default, flip the MPM_KC2D default to 2048.
    ("2d_kc2048_rw", {**B2, "MPM_KC2D": "2048"}, ["python", "bench.py"],
     900, "bench"),
    ("2d_kc4096_rw", {**B2, "MPM_KC2D": "4096"}, ["python", "bench.py"],
     900, "bench"),
    # one full default-knob driver-format artifact incl. detail.d3 +
    # multichip — exactly what the driver will run at round end.
    ("full_bench", {"BENCH_GATE_S": "300"}, ["python", "bench.py"], 3600,
     "bench"),
    # ---- round-5b legs (after the gather-binning + adaptive-respec +
    # gathered-to_host changes) ----
    # quick CLI smoke: first on-chip execution of the stacked-gather
    # bucket_by_row (from_particles + in-run rebuckets)
    ("cli_2d_smoke_v2", {}, ["python", "-m", "mpm_flip98a_tpu",
     "--scenario", "dam2d_flip98", "--path", "fast", "--frames", "2",
     "--substeps", "100", "--out", "/tmp/v2d_r5b", "--no-gif"], 1500,
     ("rc", "Run Time")),
    # rebucket decomposition with the new move (argsort/rank/scat20/
    # stack/take legs + production rebucket at 8.5k AND 1M)
    ("micro_rebucket_v2", PYPATH,
     ["python", "scripts/micro_rebucket.py"], 1800,
     ("rc", "MICRO REBUCKET DONE")),
    # the headline: end-to-end reference workload with all three fixes
    # (gathered to_host, adaptive capacity respec, gather rebucket) —
    # was 813.47 s; loop-tax data projects ~500 s
    ("endtoend_2d_v2", {}, ["python", "-m", "mpm_flip98a_tpu",
     "--scenario", "dam2d", "--path", "fast", "--frames", "300",
     "--substeps", "10000", "--out", "/tmp/endtoend_r5c", "--no-gif"],
     2400, ("rc", "Run Time")),
    ("cli_3d_smoke_v2", {}, ["python", "-m", "mpm_flip98a_tpu",
     "--scenario", "dam3d", "--path", "fast", "--frames", "2",
     "--substeps", "20", "--out", "/tmp/v3d_r5b2", "--no-gif"], 1500,
     ("rc", "Run Time")),
    # confirm the default-knob bench artifact is unchanged-or-better on
    # the new binning (bench's 200 substeps never rebucket, but
    # from_particles now runs the gather path)
    ("full_bench_v2", {"BENCH_GATE_S": "300"}, ["python", "bench.py"],
     3600, "bench"),
    # HEADROOM sweep (dead-slot lever): the bench workload peaks at
    # 2500/row -> cap 4096 at headroom 1.5, and BOTH kc2048 chunks run
    # at count 2500, so 39% of in-kernel slot work is dead.  Fitting
    # per-chunk fixed cost f=1.41 us and per-slot w=0.83 ns from the
    # committed kc512/1024/2048 A/B triple predicts cap 3072 (h=1.15)
    # at ~5.15 ms/substep = 3.49e9 and cap 2688 (h=1.05, 3 chunks)
    # WORSE than cap 3072 — sweep confirms or kills the model.
    ("2d_h115", {**B2, "MPM_HEADROOM": "1.15"}, ["python", "bench.py"],
     900, "bench"),
    ("2d_h130", {**B2, "MPM_HEADROOM": "1.30"}, ["python", "bench.py"],
     900, "bench"),
    ("2d_h105", {**B2, "MPM_HEADROOM": "1.05"}, ["python", "bench.py"],
     900, "bench"),
    # 3D headroom probe at full scale (pencil buckets, 128-chunks skip
    # finer so the dead-slot fraction is smaller — measure, don't guess)
    ("3d_h115", {**B3, "MPM_HEADROOM": "1.15"}, ["python", "bench.py"],
     1800, "bench"),
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
    Returns True if all legs are done.

    NO probe before legs: a probe client poisons the next client's
    claim (measured: 16:19 probe OK -> bench 8 s later hung).  The mega
    leg's in-process gate IS the liveness check — on a dead tunnel it
    exits in BENCH_GATE_S with its state intact."""
    consec = 0
    for name, env, argv, budget, kind in LEGS:
        if name in st["done"]:
            continue
        if consec >= 2:
            log("pass aborted: 2 consecutive device failures")
            return False
        ok, summary, dev_fail = run_leg(name, env, argv, budget, kind)
        if ok:
            st["done"][name] = {"ts": _now(), "summary": summary}
            save_state(st)
            consec = 0
        elif dev_fail:
            consec += 1
        # Inter-client cooldown: freshly-exited clients (clean OR
        # killed) leave the tunnel claim-hostile for a while.
        time.sleep(45)
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
        # No pre-pass probe (it poisons the first real client's claim);
        # the mega leg's own gate bounds a dead-tunnel attempt.
        one_pass(st)
        time.sleep(PROBE_PERIOD)


if __name__ == "__main__":
    main()
