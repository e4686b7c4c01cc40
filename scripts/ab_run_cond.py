"""A/B the fast2d.run loop structure against a bare-substep loop.

bench.py times fast2d.run (production loop: per-substep _needs_rebucket
check + lax.cond(rebucket)), while profile2d_loop.py times the bare
substep — measured 2026-08-19 on v5e-1 they differ 6.52 vs 5.59
ms/substep at 1M/513^2.  Rebucket cannot FIRE in the bench window (the
dam starts from rest: 200 substeps of free fall drift ~4e-4 cells), so
the gap is loop structure.  Legs:

  A  bare fori_loop(substep)                  — the profile number
  B  fori_loop(cond(needs, rebucket) ; substep) — the production loop
  C  B with the needs-check alone (cond dropped) — splits check vs cond
  D  while_loop structure (MPM_RUN_WHILE=1): check as loop predicate,
     cond hoisted out of the hot body — the candidate fix if B-A is
     dominated by the cond

Run on a live chip: PYTHONPATH=.:/root/.axon_site python scripts/ab_run_cond.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_workload  # noqa: E402

from mpm_flip98a_tpu.models import fast2d  # noqa: E402

N_SUB = 200


def timed(fn, b, scene, spec):
    f = jax.jit(lambda st: fn(st, scene, spec))
    out = f(b)
    float(jnp.sum(out.x0))  # warm + sync
    t0 = time.perf_counter()
    out = f(b)
    float(jnp.sum(out.x0))
    dt = (time.perf_counter() - t0) / N_SUB
    return dt


def main():
    p, scene = build_workload(False)
    spec = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=1.5)
    b = fast2d.from_particles(p, scene.cfg, spec)
    n = p.n

    def leg_a(st, scene, spec):
        return jax.lax.fori_loop(
            0, N_SUB, lambda i, s: fast2d.substep(s, scene), st
        )

    def leg_b(st, scene, spec):
        return fast2d.run(st, scene, spec, N_SUB)

    def leg_c(st, scene, spec):
        def body(i, s):
            # The check's cost without the cond: fold the flag into a
            # field XLA cannot drop (overflow is consumed by the caller).
            # NB: `overflow + 0 * flag` does NOT work — the algebraic
            # simplifier folds int x*0 to 0 and DCEs the whole check.
            # minimum(flag, 0) is also 0 (flag is 0/1) but XLA cannot
            # prove it, so the check stays live.
            import dataclasses

            flag = fast2d._needs_rebucket(s, scene.cfg).astype(jnp.int32)
            s = dataclasses.replace(
                s, overflow=s.overflow + jnp.minimum(flag, 0)
            )
            return fast2d.substep(s, scene)

        return jax.lax.fori_loop(0, N_SUB, body, st)

    def leg_d(st, scene, spec):
        import os

        os.environ["MPM_RUN_WHILE"] = "1"
        try:
            return fast2d.run(st, scene, spec, N_SUB)
        finally:
            os.environ.pop("MPM_RUN_WHILE", None)

    for name, leg in (
        ("A bare", leg_a), ("B run()", leg_b), ("C check", leg_c),
        ("D while", leg_d),
    ):
        # run() reads env knobs at trace time and its jit cache does not
        # key on them — clear between legs so B and D get fresh traces.
        jax.clear_caches()
        dt = timed(leg, b, scene, spec)
        print(
            f"{name}: {dt*1e3:6.3f} ms/substep -> {n * 18 / dt / 1e9:.3f} e9",
            flush=True,
        )


if __name__ == "__main__":
    main()
