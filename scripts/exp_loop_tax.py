"""Characterize the per-iteration device-loop tax (round 5, PERF.md).

Measured facts this script is built on (docs/measurements/r5_mega.log,
r5_campaign.log, all v5e-1 2026-08-19):
  - 1M/513^2: bare fori 6.019 ms/substep, while-loop run() 5.855,
    stage-profile kernel sum 5.565 -> a ~0.29-0.45 ms/substep tax that
    no kernel shows when timed alone.
  - 8,450/105^2 (the reference end-to-end scale): 2.36 s per 10k-substep
    frame = 0.236 ms/substep TOTAL — i.e. at tiny scale the loop tax IS
    the whole substep.
The tax being ~scale-independent suggests a fixed per-iteration cost
(kernel dispatch boundaries / pipeline drains), not HBM copies (those
would scale with state size).  This script splits the two hypotheses:

  fori1      fori_loop(n, substep)                 - baseline
  fori2      fori_loop(n/2, substep o substep)     - halves per-ITERATION
             costs (loop-carry copies/rotation), keeps per-substep
             dispatch count unchanged
  fori4      quarter-iteration variant
  while_d    fast2d.run() default (while + carried flag) - the shipped loop
  fused1     fori1 with MPM_P2G_GRID=1 (fused rolling-scratch kernel:
             3 dispatches fewer per substep) - if the tax is dispatch-
             count-bound, fused must WIN at tiny scale even though it
             measured equal at 1M
  rebucket   one rebucket() call, timed alone (informs the margin-band
             tradeoff of any unrolled production loop)

Readings:
  - fori2 << fori1 at 1M        -> per-iteration carry cost: build the
    unrolled production while loop (needs a 2x margin band: trigger at
    -0.6/1.6 instead of -0.8/1.8).
  - fori2 == fori1, fused1 << fori1 at tiny scale -> dispatch-bound:
    the end-to-end reference workload should default MPM_P2G_GRID=1
    below ~100k particles; unrolling is dead.

Run on a live chip (ONE client per tunnel window):
    PYTHONPATH=.:/root/.axon_site python scripts/exp_loop_tax.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_workload  # noqa: E402

from mpm_flip98a_tpu.config import MPMConfig  # noqa: E402
from mpm_flip98a_tpu.models import fast2d, scenes  # noqa: E402


def timed(make_fn, b, n_sub, reps=2):
    f = jax.jit(make_fn)
    out = f(b)
    float(jnp.sum(out.x0))  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(b)
        float(jnp.sum(out.x0))
        best = min(best, (time.perf_counter() - t0) / n_sub)
    return best


def legs_for(scale_name, p, scene, n_sub, n_particles):
    spec = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=1.5)
    b = fast2d.from_particles(p, scene.cfg, spec)
    ops = n_particles * 18  # 9-node P2G + G2P per substep

    def report(name, dt):
        print(
            f"[{scale_name}] {name:10s} {dt * 1e3:7.3f} ms/substep"
            f" -> {ops / dt / 1e9:6.3f} e9",
            flush=True,
        )

    def fori_k(k):
        def fn(st):
            def body(i, s):
                for _ in range(k):
                    s = fast2d.substep(s, scene)
                return s

            return jax.lax.fori_loop(0, n_sub // k, body, st)

        return fn

    for k in (1, 2, 4):
        jax.clear_caches()
        report(f"fori{k}", timed(fori_k(k), b, n_sub))

    jax.clear_caches()
    os.environ["MPM_RUN_WHILE"] = "1"
    report(
        "while_d",
        timed(lambda st: fast2d.run(st, scene, spec, n_sub), b, n_sub),
    )
    os.environ.pop("MPM_RUN_WHILE", None)

    jax.clear_caches()
    os.environ["MPM_P2G_GRID"] = "1"
    try:
        report("fused1", timed(fori_k(1), b, n_sub))
    finally:
        os.environ.pop("MPM_P2G_GRID", None)
    jax.clear_caches()

    # one rebucket, timed alone (amortization unit for the band tradeoff)
    f = jax.jit(lambda st: fast2d.rebucket(st, scene.cfg, spec))
    out = f(b)
    float(jnp.sum(out.x0))
    t0 = time.perf_counter()
    out = f(b)
    float(jnp.sum(out.x0))
    print(
        f"[{scale_name}] rebucket   {(time.perf_counter() - t0) * 1e3:7.3f}"
        " ms/call",
        flush=True,
    )


def main():
    n_tiny = int(os.environ.get("EXP_NSUB_TINY", "2000"))
    n_big = int(os.environ.get("EXP_NSUB_BIG", "200"))

    # tiny scale first: cheap compiles, answers the dispatch question
    p, scene = scenes.dam_break_2d(MPMConfig(), dtype=np.float32)
    legs_for("8k5/105^2", p, scene, n_sub=n_tiny, n_particles=int(p.n))

    if os.environ.get("EXP_SKIP_BIG") != "1":
        p, scene = build_workload(False)
        legs_for("1M/513^2", p, scene, n_sub=n_big, n_particles=int(p.n))
    print("EXP LOOP TAX DONE", flush=True)


if __name__ == "__main__":
    main()
