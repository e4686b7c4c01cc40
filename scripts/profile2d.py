"""Component-level timing of the 2D fast path at the bench scale
(1M particles, 513^2)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.models import fast2d
from mpm_flip98a_tpu.models.stabilized import PAD
from mpm_flip98a_tpu.ops.pallas import transfer2d as tk

import sys
sys.path.insert(0, ".")
from bench import build_workload  # noqa: E402


def timeit(fn, *args, reps=20, warm=2):
    def reps_fn(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x[..., :1].astype(jnp.float32)) for x in leaves if x.ndim)

    f = jax.jit(reps_fn)
    for _ in range(warm):
        float(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f(*args))
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

    def prep(b):
        gx0 = b.x0 * inv_dx + jnp.float32(PAD)
        gx1 = b.x1 * inv_dx + jnp.float32(PAD)
        kb = jnp.float32(scene.params.bulk_modulus)
        mu = jnp.float32(scene.params.dynamic_viscosity)
        pressure = -kb * (b.J - 1.0)
        div = b.C00 + b.C11
        vj = b.vol0 * b.J
        t00 = vj * (-pressure + 2.0 * mu * (b.C00 - 0.5 * div))
        t11 = vj * (-pressure + 2.0 * mu * (b.C11 - 0.5 * div))
        t01 = vj * (2.0 * mu * 0.5 * (b.C01 + b.C10))
        fa = -dt * jnp.float32(dinv)
        z = jnp.zeros_like(b.C00)
        m = b.mass * b.mask
        rows_ = [
            gx0, gx1, m * b.v0, m * b.v1, z, z, z, z,
            (fa * t00) * b.mask, (fa * t01) * b.mask,
            (fa * t01) * b.mask, (fa * t11) * b.mask, m, vj * b.mask,
        ]
        return jnp.stack(rows_, axis=1)

    pdata = jax.jit(prep)(b)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    print(f"prep+stack  : {timeit(prep, b)*1e3:7.3f} ms", flush=True)

    p2g = lambda pd: tk.p2g(pd, counts, g, dx, apic=False)
    print(f"p2g kernel  : {timeit(p2g, pdata)*1e3:7.3f} ms", flush=True)
    expanded = jax.jit(p2g)(pdata)
    print(f"fold_rows   : {timeit(tk.fold_rows, expanded)*1e3:7.3f} ms", flush=True)

    gs = jax.jit(tk.fold_rows)(expanded)

    def grid_update(gs):
        from mpm_flip98a_tpu.models import fast2d

        return fast2d._grid_update2d(gs, scene, False, None, None)

    print(f"grid update : {timeit(grid_update, gs)*1e3:7.3f} ms", flush=True)
    grid4 = jax.jit(grid_update)(gs)

    def g2p_stage(b, grid4):
        gx0 = b.x0 * inv_dx + jnp.float32(PAD)
        gx1 = b.x1 * inv_dx + jnp.float32(PAD)
        pdata2 = jnp.stack([gx0, gx1, b.mask], axis=1)
        return tk.g2p(pdata2, counts, grid4, dx, dinv)

    print(f"g2p kernel  : {timeit(g2p_stage, b, grid4)*1e3:7.3f} ms", flush=True)
    out8 = jax.jit(g2p_stage)(b, grid4)

    def particle_update(b, out8):
        vpic0, vpic1 = out8[:, 0], out8[:, 1]
        vold0, vold1 = out8[:, 2], out8[:, 3]
        c00, c01, c10, c11 = out8[:, 4], out8[:, 5], out8[:, 6], out8[:, 7]
        alpha = jnp.float32(cfg.flip_blend)
        nv0 = alpha * (b.v0 + vpic0 - vold0) + (1 - alpha) * vpic0
        div_new = c00 + c11
        return (
            b.x0 + dt * vpic0 * b.mask,
            nv0 * b.mask,
            jnp.where(b.mask > 0, b.J * (1.0 + dt * div_new), 1.0),
        )

    print(f"part update : {timeit(particle_update, b, out8)*1e3:7.3f} ms", flush=True)

    t_sub = timeit(lambda st: fast2d.substep(st, scene), b, reps=20)
    print(f"full substep: {t_sub*1e3:7.3f} ms -> {p.n * 18 / t_sub / 1e9:.3f} e9", flush=True)


if __name__ == "__main__":
    main()
