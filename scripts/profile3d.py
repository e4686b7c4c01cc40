"""Component-level timing of the 3D fast path at BASELINE 8M/256^3 scale.

Times each piece of fast3d.substep in isolation on the real chip (sync by
scalar materialisation per CLAUDE.md) to find where the 0.5 s/substep goes:
pdata assembly, p2g3d, fold_rows0, grid update, g2p3d, particle update.

Usage: python scripts/profile3d.py [small]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.config import EOSKind, TransferKind
from mpm_flip98a_tpu.models import fast3d, scenes
from mpm_flip98a_tpu.models.stabilized import PAD, _apply_wall_bc
from mpm_flip98a_tpu.ops.pallas import transfer3d as tk3


def timeit(fn, *args, reps=10, warm=2):
    # Chain reps inside ONE jit so per-rep outputs don't accumulate in HBM
    # and dispatch overhead (30 ms/round-trip on axon) amortises.
    def reps_fn(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x[..., :1].astype(jnp.float32)) for x in leaves)

    f = jax.jit(reps_fn)
    for _ in range(warm):
        float(f(*args))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        acc += float(f(*args))
    return (time.perf_counter() - t0) / reps


def main():
    small = len(sys.argv) > 1 and sys.argv[1] == "small"
    if small:
        p, scene = scenes.slab_3d()
    else:
        p, scene = scenes.slab_3d(num_grids=256, particles_per_axis=(512, 512, 32))
    cfg = scene.cfg
    spec = fast3d.FastSpec3D.for_particles(cfg, p, headroom=1.5)
    b = jax.jit(lambda p: fast3d.from_particles(p, cfg, spec))(p)
    n_p = p.n
    p = None  # keep only b's (R, K) state resident
    print(f"N={n_p} G={cfg.num_grids} rows={spec.rows0}x{spec.rows1} K={spec.capacity}", flush=True)

    g = cfg.num_grids
    r0, r1 = spec.rows0, spec.rows1
    dt = jnp.float32(cfg.dt)
    dx = float(cfg.dx)
    dinv = float(4.0 * cfg.inv_dx * cfg.inv_dx)

    # --- stage 1: pdata assembly (stress + stack) ---
    def assemble(b):
        inv_dx = jnp.float32(cfg.inv_dx)
        gx = [b.x0 * inv_dx + PAD, b.x1 * inv_dx + PAD, b.x2 * inv_dx + PAD]
        kb = jnp.float32(scene.params.bulk_modulus)
        mu = jnp.float32(scene.params.dynamic_viscosity)
        pressure = -kb * (b.J - 1.0)
        cmat = [[getattr(b, f"C{a}{c}") for c in range(3)] for a in range(3)]
        div = cmat[0][0] + cmat[1][1] + cmat[2][2]
        vj = b.vol0 * b.J
        fa = -dt * jnp.float32(dinv)
        m = b.mass * b.mask
        p_aff = [[b.mass * cmat[a][c] * b.mask for c in range(3)] for a in range(3)]
        q_aff = [
            [
                p_aff[a][c]
                + fa
                * (
                    vj
                    * (
                        (-pressure if a == c else 0.0)
                        + 2.0 * mu * (0.5 * (cmat[a][c] + cmat[c][a]) - (div / 3.0 if a == c else 0.0))
                    )
                )
                * b.mask
                for c in range(3)
            ]
            for a in range(3)
        ]
        fields = (
            gx[0], gx[1], gx[2], m * b.v0, m * b.v1, m * b.v2,
            *(p_aff[a][c] for a in range(3) for c in range(3)),
            *(q_aff[a][c] for a in range(3) for c in range(3)),
            m, vj * b.mask,
        )
        return jnp.stack(fields, axis=1).reshape(r0, r1, 26, spec.capacity)

    pdata = jax.jit(assemble)(b)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    t_asm = timeit(assemble, b)
    print(f"pdata assembly : {t_asm*1e3:8.2f} ms", flush=True)

    # --- stage 2: p2g3d kernel ---
    t_p2g = timeit(lambda pd: tk3.p2g3d(pd, counts, g, g, dx), pdata)
    print(f"p2g3d kernel   : {t_p2g*1e3:8.2f} ms", flush=True)

    expanded = tk3.p2g3d(pdata, counts, g, g, dx)

    # --- stage 3: fold_rows0 ---
    t_fold = timeit(tk3.fold_rows0, expanded)
    print(f"fold_rows0     : {t_fold*1e3:8.2f} ms", flush=True)

    gs = tk3.fold_rows0(expanded)
    expanded = None

    # --- stage 4: grid update ---
    def grid_update(gs):
        g_m = gs[6]
        has = g_m > 0
        safe = jnp.where(has, g_m, 1.0)
        v0g = jnp.where(has, gs[0:3] / safe, 0.0)
        vng = jnp.where(has, gs[3:6] / safe, 0.0)
        grav = jnp.asarray(cfg.gravity_acceleration(scene.physics), jnp.float32)
        vng = vng + dt * grav[:, None, None, None] * has.astype(jnp.float32)
        v_new = _apply_wall_bc(jnp.moveaxis(vng, 0, -1), cfg, scene.wall)
        grid6 = jnp.concatenate([jnp.moveaxis(v_new, -1, 0), v0g], axis=0)
        return jnp.moveaxis(grid6, 0, 2)

    t_grid = timeit(grid_update, gs)
    print(f"grid update    : {t_grid*1e3:8.2f} ms", flush=True)
    grid6 = jax.jit(grid_update)(gs)

    # --- stage 5: pdata2 assembly + g2p ---
    inv_dx = jnp.float32(cfg.inv_dx)

    def assemble2(b):
        gx = [b.x0 * inv_dx + PAD, b.x1 * inv_dx + PAD, b.x2 * inv_dx + PAD]
        return jnp.stack([gx[0], gx[1], gx[2], b.mask], axis=1).reshape(
            r0, r1, 4, spec.capacity
        )

    pdata2 = jax.jit(assemble2)(b)
    t_asm2 = timeit(assemble2, b)
    print(f"pdata2 assembly: {t_asm2*1e3:8.2f} ms", flush=True)

    t_g2p = timeit(lambda pd: tk3.g2p3d(pd, counts, grid6, dx, dinv), pdata2)
    print(f"g2p3d kernel   : {t_g2p*1e3:8.2f} ms", flush=True)

    # --- full substep for reference ---
    t_sub = timeit(lambda st: fast3d.substep(st, scene, spec), b, reps=5)
    print(f"full substep   : {t_sub*1e3:8.2f} ms", flush=True)
    n_ops = n_p * 27 * 2
    print(f"=> {n_ops / t_sub / 1e9:.3f} e9 transfer ops/s")


if __name__ == "__main__":
    main()
