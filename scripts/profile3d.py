"""Component-level timing of the 3D fast path at BASELINE 8M/256^3 scale.

Times each piece of fast3d.substep in isolation on the real chip (sync by
scalar materialisation; each timeit rep pays one ~30 ms axon round-trip,
so times are upper bounds — subtract ~30/reps ms).

Usage: python scripts/profile3d.py [small]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.config import TransferKind
from mpm_flip98a_tpu.models import fast3d, scenes
from mpm_flip98a_tpu.models.stabilized import PAD, _apply_wall_bc
from mpm_flip98a_tpu.ops.pallas import transfer3d as tk3


def timeit(fn, *args, reps=10, warm=2):
    def reps_fn(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x[..., :1].astype(jnp.float32)) for x in leaves)

    f = jax.jit(reps_fn)
    for _ in range(warm):
        float(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f(*args))
    return (time.perf_counter() - t0) / reps


def main():
    small = len(sys.argv) > 1 and sys.argv[1] == "small"
    if small:
        p, scene = scenes.slab_3d()
    else:
        p, scene = scenes.slab_3d(num_grids=256, particles_per_axis=(512, 512, 32))
    cfg = scene.cfg
    spec = fast3d.FastSpec3D.for_particles(cfg, p, headroom=1.5)
    b = jax.jit(lambda q: fast3d.from_particles(q, cfg, spec))(p)
    n_p = p.n
    p = None
    print(f"N={n_p} G={cfg.num_grids} K={spec.capacity}", flush=True)

    g = cfg.num_grids
    r0, r1, k = spec.rows0, spec.rows1, spec.capacity
    dt = jnp.float32(cfg.dt)
    dx = float(cfg.dx)
    dinv = float(4.0 * cfg.inv_dx * cfg.inv_dx)
    apic = cfg.transfer == TransferKind.APIC
    shaped = lambda a: a.reshape(r0, r1, k)

    # --- stage 1: stress + field prep (XLA elementwise) ---
    def prep(b):
        kb = jnp.float32(scene.params.bulk_modulus)
        mu = jnp.float32(scene.params.dynamic_viscosity)
        pressure = -kb * (b.J - 1.0)
        cmat = [[getattr(b, f"C{a}{c}") for c in range(3)] for a in range(3)]
        div = cmat[0][0] + cmat[1][1] + cmat[2][2]
        vj = b.vol0 * b.J
        fa = -dt * jnp.float32(dinv)
        m = b.mass * b.mask
        q_aff = [
            [
                fa
                * vj
                * (
                    (-pressure if a == c else 0.0)
                    + 2.0 * mu * (0.5 * (cmat[a][c] + cmat[c][a]) - (div / 3.0 if a == c else 0.0))
                )
                * b.mask
                for c in range(3)
            ]
            for a in range(3)
        ]
        return (
            shaped(b.x0), shaped(b.x1), shaped(b.x2),
            shaped(m * b.v0), shaped(m * b.v1), shaped(m * b.v2),
            *(shaped(q_aff[a][c]) for a in range(3) for c in range(3)),
            shaped(m),
        )

    fields = jax.jit(prep)(b)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    print(f"field prep     : {timeit(prep, b)*1e3:8.2f} ms", flush=True)

    # --- stage 2: p2g3d kernel ---
    p2g = lambda fs: tk3.p2g3d(fs, counts, g, g, dx, float(cfg.inv_dx), float(PAD), apic=apic)
    print(f"p2g3d kernel   : {timeit(p2g, fields)*1e3:8.2f} ms", flush=True)
    expanded = jax.jit(p2g)(fields)

    # --- stage 3: fold_rows0 ---
    print(f"fold_rows0     : {timeit(tk3.fold_rows0, expanded)*1e3:8.2f} ms", flush=True)
    gs = jax.jit(tk3.fold_rows0)(expanded)
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

    print(f"grid update    : {timeit(grid_update, gs)*1e3:8.2f} ms", flush=True)
    grid6 = jax.jit(grid_update)(gs)
    gs = None

    # --- stage 5: g2p ---
    def g2p(b, grid6):
        return tk3.g2p3d(
            shaped(b.x0), shaped(b.x1), shaped(b.x2), shaped(b.mask),
            counts, grid6, dx, dinv, float(cfg.inv_dx), float(PAD),
        )

    print(f"g2p3d kernel   : {timeit(g2p, b, grid6)*1e3:8.2f} ms", flush=True)
    out = jax.jit(g2p)(b, grid6)

    # --- stage 6: particle update (approximate: blend + advect + J) ---
    def particle_update(b, out):
        o = out.reshape(r0 * r1, out.shape[2], k)
        vpic = [o[:, a] for a in range(3)]
        vold = [o[:, 3 + a] for a in range(3)]
        c_new = [o[:, 6 + i] for i in range(9)]
        alpha = jnp.float32(cfg.flip_blend)
        nv = [
            alpha * (vv + vp - vo) + (1 - alpha) * vp
            for vv, vp, vo in zip((b.v0, b.v1, b.v2), vpic, vold)
        ]
        div_new = c_new[0] + c_new[4] + c_new[8]
        return (
            b.x0 + dt * vpic[0] * b.mask,
            nv[0] * b.mask,
            jnp.where(b.mask > 0, b.J * (1.0 + dt * div_new), 1.0),
        )

    print(f"particle update: {timeit(particle_update, b, out)*1e3:8.2f} ms", flush=True)

    # --- full substep ---
    t_sub = timeit(lambda st: fast3d.substep(st, scene, spec), b, reps=5)
    print(f"full substep   : {t_sub*1e3:8.2f} ms", flush=True)
    print(f"=> {n_p * 54 / t_sub / 1e9:.3f} e9 transfer ops/s", flush=True)


if __name__ == "__main__":
    main()
