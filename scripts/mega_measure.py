"""ONE-CLIENT measurement sweep: claim the TPU once, measure everything.

Tunnel model (measured 2026-08-19, revising again): when a window opens,
the FIRST client claims and runs fine; clients that connect shortly
after another client (even after a clean exit, even a trivial probe)
frequently hang at their first device op and never recover.  The 15:50
window: probe OK -> leg1 OK -> legs 2..4 all hung at claim.  The 16:19
window: probe OK -> bench 8 s later hung at claim.  One-process-per-
measurement therefore extracts ONE number per window; this script
extracts ALL of them from a single claim:

  - every 2D bench knob config (env set + jax.clear_caches() between
    configs — knobs are read at trace time),
  - 3D full + small + KC A/B,
  - the validation protocol (incl. the round-4 TPU-unvalidated
    collider kernels),
  - the run-loop structure A/B (ab_run_cond legs),
  - stage profiles (2D + 3D) and the bf16 VPU gate.

Per-stage results append to docs/measurements/r5_mega_state.json AS
THEY LAND (a wedge mid-sweep loses only the in-flight stage), and a
stage that already has a result is skipped on re-run, so re-invoking
after every window converges to full coverage.  The stage watchdog is
bench._Watchdog: on a wedge it hard-exits; state is already on disk.

Run: PYTHONPATH=.:/root/.axon_site python scripts/mega_measure.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, ".")

import bench  # noqa: E402  (watchdog, workload builders, bench legs)

STATE = os.path.join("docs", "measurements", "r5_mega_state.json")

KNOBS = (
    "MPM_P2G_GRID", "MPM_GCROP", "MPM_RUN_WHILE", "MPM_FUSE2D_G2P",
    "MPM_KC2D", "MPM_KC3D", "BENCH_3D_SMALL",
)


def now() -> str:
    return datetime.now(timezone.utc).isoformat(timespec="seconds")


def load() -> dict:
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {}


def save(st: dict):
    with open(STATE, "w") as f:
        json.dump(st, f, indent=1)


def set_knobs(env: dict):
    import jax

    for k in KNOBS:
        os.environ.pop(k, None)
    os.environ.update(env)
    jax.clear_caches()


def stage(st: dict, name: str, budget: float, fn):
    if name in st:
        print(f"SKIP {name} (done: {st[name].get('summary', '')})",
              flush=True)
        return
    print(f"STAGE {name} start {now()} (budget {budget:.0f}s)", flush=True)
    bench._dog.arm(name, budget)
    t0 = time.perf_counter()
    try:
        out = fn()
        bench._dog.disarm()
        st[name] = {
            "ts": now(), "elapsed_s": round(time.perf_counter() - t0, 1),
            "result": out,
            "summary": (f"value={out['value']:.4g}"
                        if isinstance(out, dict) and "value" in out
                        else "ok"),
        }
        print(f"STAGE {name} OK: {st[name]['summary']}", flush=True)
    except Exception as e:  # noqa: BLE001 — per-stage isolation
        bench._dog.disarm()
        st[name] = {"ts": now(), "error": repr(e), "summary": f"ERR {e!r}"}
        print(f"STAGE {name} ERROR: {e!r}", flush=True)
    save(st)


class _Tee:
    """Mirror stdout to the persistent mega log, flushing every write —
    the watchdog hard-exits via os._exit, which skips atexit flushes."""

    def __init__(self, path):
        self.f = open(path, "a")
        self.s = sys.stdout

    def write(self, x):
        self.f.write(x)
        self.f.flush()
        self.s.write(x)
        self.s.flush()

    def flush(self):
        self.f.flush()
        self.s.flush()


def main():
    os.makedirs(os.path.dirname(STATE), exist_ok=True)
    sys.stdout = _Tee(os.path.join("docs", "measurements", "r5_mega.log"))
    print(f"==== mega_measure {now()}", flush=True)
    st = load()
    bench._dog = bench._Watchdog()

    # The claim: first device op of this client, watchdog-bounded.  No
    # probe ran before us; if this hangs the watchdog exits rc=3 and
    # the state file is untouched.
    bench._dog.arm("claim", float(os.environ.get("BENCH_GATE_S", "300")))
    import jax
    import jax.numpy as jnp

    assert float(jnp.sum(jnp.ones(8))) == 8.0
    bench._dog.disarm()
    print(f"CLAIM OK {now()} backend={jax.default_backend()}", flush=True)

    # --- 2D bench knob matrix (headline first) ---------------------
    for name, env in (
        # NOTE stage names are measurement IDs: a name maps to the
        # (knobs, code-at-the-time) pair recorded in the state file.
        # 2d_default/2d_runwhile were captured 2026-08-19 ~16:40 on the
        # predicate-check while build; 2d_carryflag measures the
        # carry-flag while (default since the same evening).
        ("2d_default", {}),
        ("2d_fused", {"MPM_P2G_GRID": "1"}),
        ("2d_runwhile", {"MPM_RUN_WHILE": "1"}),
        ("2d_fused_runwhile", {"MPM_P2G_GRID": "1", "MPM_RUN_WHILE": "1"}),
        ("2d_uncropped", {"MPM_GCROP": "0"}),
        ("2d_fused_uncropped", {"MPM_P2G_GRID": "1", "MPM_GCROP": "0"}),
        ("2d_carryflag", {}),
        ("2d_carryflag_fori", {"MPM_RUN_WHILE": "0"}),
    ):
        if name not in st:
            set_knobs(env)
        stage(st, name, 900, lambda: bench.main2d(200, False))

    # --- 3D headline + A/B -----------------------------------------
    if "3d_full" not in st:
        set_knobs({})
    stage(st, "3d_full", 2700, lambda: bench.main3d(50))
    if "3d_full_runwhile" not in st:
        set_knobs({"MPM_RUN_WHILE": "1"})
    stage(st, "3d_full_runwhile", 1800, lambda: bench.main3d(50))
    if "3d_full_kc1024" not in st:
        set_knobs({"MPM_KC3D": "1024"})
    stage(st, "3d_full_kc1024", 1800, lambda: bench.main3d(50))
    if "3d_small" not in st:
        set_knobs({"BENCH_3D_SMALL": "1"})
    stage(st, "3d_small", 1200, lambda: bench.main3d(50))
    if "3d_carryflag" not in st:
        set_knobs({})
    stage(st, "3d_carryflag", 1800, lambda: bench.main3d(50))

    # --- validation protocol (collider kernels incl.) --------------
    set_knobs({})
    import scripts.validate_dots as vd

    for name, fn, budget in (
        ("val_pou", vd.pou_probe, 600),
        ("val_crop", vd.crop_probe, 600),
        ("val_tap2d", vd.tap_2d, 600),
        ("val_collider2d", vd.collider_tap_2d, 900),
        ("val_collider3d", vd.collider_tap_3d, 900),
        ("val_tap3d", vd.tap_3d, 900),
        ("val_collider_stab", vd.collider_stability_2d, 1200),
        ("val_fluid_stab", vd.stability_3d_fluid, 1200),
        ("val_stab3d", vd.stability_3d, 1200),
    ):
        stage(st, name, budget,
              lambda fn=fn: {"ok": bool(fn()[0])})

    # --- run-loop structure A/B + profiles + bf16 gate --------------
    set_knobs({})
    import scripts.ab_run_cond as ab

    stage(st, "ab_run_cond", 2400, lambda: ab.main() or {"ok": True})

    set_knobs({})
    import scripts.profile2d_loop as p2

    stage(st, "profile2d", 1500, lambda: p2.main() or {"ok": True})

    if "profile3d" not in st:
        set_knobs({"BENCH_3D_SMALL": "1"})
    import scripts.profile3d_loop as p3

    stage(st, "profile3d", 1800, lambda: p3.main() or {"ok": True})

    set_knobs({})
    import scripts.micro_bf16_vpu as bf

    stage(st, "bf16_gate", 1200, lambda: bf.main() or {"ok": True})

    # --- remaining 2D knob legs -------------------------------------
    for name, env in (
        ("2d_fuse_g2p", {"MPM_FUSE2D_G2P": "1"}),
        ("2d_kc2048", {"MPM_KC2D": "2048"}),
        ("2d_kc512", {"MPM_KC2D": "512"}),
    ):
        if name not in st:
            set_knobs(env)
        stage(st, name, 900, lambda: bench.main2d(200, False))

    done = sum(1 for v in st.values() if "error" not in v)
    print(f"MEGA DONE {now()}: {done}/{len(st)} stages ok", flush=True)


if __name__ == "__main__":
    main()
