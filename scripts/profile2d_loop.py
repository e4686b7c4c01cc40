"""Loop-amortised component timing of the 2D fast path at the bench
scale (1M particles, 513^2).

profile2d.py times one stage call per host sync, so the axon tunnel's
~30 ms fixed round-trip dominates and single-stage numbers are +-2 ms
noise.  Here each stage runs `reps` times inside ONE jitted fori_loop
(inputs perturbed by i * 1e-30 so XLA cannot CSE the calls) with a
single host sync at the end — per-iteration cost resolves to ~10 us.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.models import fast2d
from mpm_flip98a_tpu.models.stabilized import PAD
from mpm_flip98a_tpu.ops.pallas import transfer2d as tk

import sys
sys.path.insert(0, ".")
from bench import build_workload  # noqa: E402

REPS = 50


def timeit_loop(fn, *args, reps=REPS):
    """Time fn(*args) averaged over `reps` in-jit iterations.

    The FIRST array argument gets + i * 1e-30 added per iteration (a
    no-op in fp32 arithmetic but opaque to XLA's CSE), and the running
    scalar accumulator consumes one element of the output, so every
    iteration must execute."""

    def body(i, acc):
        a0 = args[0] + i.astype(jnp.float32) * jnp.float32(1e-30)
        out = fn(a0, *args[1:])
        leaves = jax.tree_util.tree_leaves(out)
        return acc + sum(
            x.reshape(-1)[0].astype(jnp.float32) for x in leaves if x.ndim
        )

    f = jax.jit(lambda: jax.lax.fori_loop(0, reps, body, jnp.float32(0.0)))
    float(f())  # warm the exact cache entry
    t0 = time.perf_counter()
    float(f())
    return (time.perf_counter() - t0) / reps


def main():
    p, scene = build_workload(False)
    cfg = scene.cfg
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=1.5)
    b = jax.jit(lambda q: fast2d.from_particles(q, cfg, spec))(p)
    print(f"N={p.n} G={cfg.num_grids} K={spec.capacity}", flush=True)
    g = cfg.num_grids
    dt = jnp.float32(cfg.dt)
    dx = float(cfg.dx)
    dinv = float(4.0 * cfg.inv_dx * cfg.inv_dx)
    inv_dx = jnp.float32(cfg.inv_dx)

    gx0 = b.x0 * inv_dx + jnp.float32(PAD)
    gx1 = b.x1 * inv_dx + jnp.float32(PAD)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)

    # Fused-stress P2G (the bench default path).
    sdata = jnp.stack(
        [gx0, gx1, b.v0, b.v1, b.C00, b.C01, b.C10, b.C11, b.J, b.mass, b.vol0],
        axis=1,
    )
    p2gf = lambda sd: tk.p2g_fused(
        sd, counts, g, dx, tent=False, apic=False, eos="tait",
        kb=float(scene.params.bulk_modulus),
        mu=float(scene.params.dynamic_viscosity),
        gamma=float(scene.params.tait_gamma), fa=float(-cfg.dt * dinv),
    )
    print(f"p2g_fused   : {timeit_loop(p2gf, sdata)*1e3:7.3f} ms", flush=True)
    expanded = jax.jit(p2gf)(sdata)

    print(f"fold_rows   : {timeit_loop(tk.fold_rows, expanded)*1e3:7.3f} ms",
          flush=True)
    gs = jax.jit(tk.fold_rows)(expanded)

    # Fused single-chip kernel: P2G + fold + grid update in one pass
    # (the production single-chip tail).
    p2g_grid = lambda sd: fast2d._p2g_grid(
        sd, counts, scene, fused=True, tent=False, apic=False, eos="tait"
    )
    print(f"p2g_grid    : {timeit_loop(p2g_grid, sdata)*1e3:7.3f} ms",
          flush=True)

    def grid_update(gs5):
        # Bench path: non-ext single-fluid — pad channel V with zeros to
        # reuse _grid_update2d's channel layout (it reads channels 0-4).
        return fast2d._grid_update2d(
            jnp.concatenate([gs5, jnp.zeros_like(gs5[:, :1])], axis=1),
            scene, False, None, None,
        )

    print(f"grid update : {timeit_loop(grid_update, gs)*1e3:7.3f} ms", flush=True)
    grid4 = jax.jit(grid_update)(gs)

    pdata2 = jnp.stack([gx0, gx1, b.mask], axis=1)
    g2ps = lambda pd: tk.g2p(pd, counts, grid4, dx, dinv)
    print(f"g2p kernel  : {timeit_loop(g2ps, pdata2)*1e3:7.3f} ms", flush=True)

    t_sub = timeit_loop(lambda x0: fast2d.substep(
        fast2d.FluidBuckets(**{**{f.name: getattr(b, f.name) for f in
                                  __import__("dataclasses").fields(b)},
                               "x0": x0}), scene), b.x0, reps=REPS)
    print(f"full substep: {t_sub*1e3:7.3f} ms -> {p.n * 18 / t_sub / 1e9:.3f} e9",
          flush=True)

    # Run-loop overhead line items (VERDICT r4 item 3: the bench substep
    # carries ~0.9 ms over the bare substep; split check vs cond vs
    # loop structure — scripts/ab_run_cond.py gives the leg-level view,
    # these give the stage-level one).
    t_chk = timeit_loop(
        lambda x0: fast2d._needs_rebucket(
            fast2d.FluidBuckets(**{**{f.name: getattr(b, f.name) for f in
                                      __import__("dataclasses").fields(b)},
                                   "x0": x0}), cfg),
        b.x0, reps=REPS)
    print(f"needs_rebucket check: {t_chk*1e3:7.3f} ms", flush=True)

    def sub_plus_check(x0):
        st = fast2d.FluidBuckets(**{**{f.name: getattr(b, f.name) for f in
                                       __import__("dataclasses").fields(b)},
                                    "x0": x0})
        flag = fast2d._needs_rebucket(st, cfg).astype(jnp.int32)
        st = __import__("dataclasses").replace(
            st, overflow=st.overflow + jnp.minimum(flag, 0))
        return fast2d.substep(st, scene)

    t_sc = timeit_loop(sub_plus_check, b.x0, reps=REPS)
    print(f"substep+check: {t_sc*1e3:7.3f} ms (check adds "
          f"{(t_sc - t_sub)*1e3:+.3f})", flush=True)


if __name__ == "__main__":
    main()
