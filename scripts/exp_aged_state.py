"""Decompose the flow-state-dependent tiny-scale substep cost.

The end-to-end reference workload (8,450 particles / 105² grid) costs
~0.10 ms/substep on the FRESH dam block but ~0.24 ms/substep once the
collapse is under way (uniform 2.4-2.5 s per 10k-substep frame in the
300-frame runs; a 4-frame probe sees only the cheap free-fall phase).
Two candidate causes, separable by measurement:

  1. rebucket cadence — every outer while-loop exit runs the ~5 ms
     on-device rebucket (sort at 8.5k) + one extra dispatch round;
  2. bucket spreading — the fresh block occupies ~26 dense rows, the
     collapsed pool ~100 sparse ones: more non-empty row programs at
     roughly fixed per-row cost.

Legs (all on the SAME aged state, mid-collapse t≈0.7 s):
  aged fori1     bare fori(substep)      — pure kernel cost on the
                 spread state (no check, no rebucket): isolates (2)
  aged while_d   production run()        — adds check + rebuckets: the
                 difference to fori1 is (1)
  rebucket_count mirror of run()'s outer loop carrying a counter —
                 measures how often rebucket actually fires per 10k
  fresh fori1 / while_d — control (should reproduce 0.075 / 0.105)

Run on a live chip:
    PYTHONPATH=.:/root/.axon_site python scripts/exp_aged_state.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mpm_flip98a_tpu.config import MPMConfig  # noqa: E402
from mpm_flip98a_tpu.models import fast2d, scenes  # noqa: E402

AGE_SUB = int(os.environ.get("EXP_AGE_SUB", "700000"))
N_SUB = int(os.environ.get("EXP_NSUB", "10000"))


def timed(make_fn, b, n_sub, reps=2):
    f = jax.jit(make_fn)
    out = f(b)
    float(jnp.sum(out.x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(b)
        float(jnp.sum(out.x0))
        best = min(best, (time.perf_counter() - t0) / n_sub)
    return best


def rebucket_count(b, scene, spec, n_sub):
    """run()'s outer/inner while structure, carrying a fire counter."""
    cfg = scene.cfg

    def inner_cond(c):
        j, s, flag = c
        return jnp.logical_and(j < n_sub, ~flag)

    def inner_body(c):
        j, s, _ = c
        s = fast2d.substep(s, scene)
        return j + 1, s, fast2d._needs_rebucket(s, cfg)

    def outer_cond(c):
        j, _, _, _ = c
        return j < n_sub

    def outer_body(c):
        j, s, flag, fires = c
        j, s, flag = jax.lax.while_loop(inner_cond, inner_body, (j, s, flag))

        def fix(q):
            q = fast2d.rebucket(q, cfg, spec)
            q = fast2d.substep(q, scene)
            return q, fast2d._needs_rebucket(q, cfg), fires + 1

        s, flag, fires = jax.lax.cond(
            j < n_sub, fix, lambda q: (q, flag, fires), s
        )
        j = jnp.minimum(j + 1, n_sub)
        return j, s, flag, fires

    f = jax.jit(
        lambda st: jax.lax.while_loop(
            outer_cond,
            outer_body,
            (0, st, fast2d._needs_rebucket(st, cfg), jnp.int32(0)),
        )[3]
    )
    return int(f(b))


def legs(tag, b, scene, spec):
    def fori1(st):
        return jax.lax.fori_loop(
            0, N_SUB, lambda i, s: fast2d.substep(s, scene), st
        )

    jax.clear_caches()
    dt = timed(fori1, b, N_SUB)
    print(f"[{tag}] fori1    {dt * 1e3:7.4f} ms/substep", flush=True)
    jax.clear_caches()
    dt = timed(lambda st: fast2d.run(st, scene, spec, N_SUB), b, N_SUB)
    print(f"[{tag}] while_d  {dt * 1e3:7.4f} ms/substep", flush=True)
    jax.clear_caches()
    n = rebucket_count(b, scene, spec, N_SUB)
    print(f"[{tag}] rebucket fires per {N_SUB}: {n}", flush=True)
    # occupancy snapshot
    counts = np.asarray(jnp.sum((b.mask > 0).astype(jnp.int32), axis=1))
    print(
        f"[{tag}] rows occupied: {(counts > 0).sum()}/{counts.shape[0]}"
        f" max/row {counts.max()}",
        flush=True,
    )


def main():
    p, scene = scenes.dam_break_2d(MPMConfig(), dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=1.5)
    b = fast2d.from_particles(p, scene.cfg, spec)

    legs("fresh", b, scene, spec)

    # Age in 10k-substep device calls (the production frame cadence): a
    # single 700k-substep call held the chip for minutes and the TPU
    # worker crashed/restarted mid-run (observed 2026-08-19 21:35Z) —
    # keep per-call device time at the proven frame scale.
    t0 = time.perf_counter()
    aged = b
    done = 0
    while done < AGE_SUB:
        step = min(10_000, AGE_SUB - done)
        aged = fast2d.run(aged, scene, spec, step)
        done += step
    float(jnp.sum(aged.x0))
    print(f"aged {AGE_SUB} substeps in {time.perf_counter() - t0:.1f} s",
          flush=True)
    legs(f"aged@{AGE_SUB}", aged, scene, spec)
    print("EXP AGED DONE", flush=True)


if __name__ == "__main__":
    main()
