"""Loop-amortised component timing of the 3D fast path (round-3 kernels).

Times the rolling-scratch fused kernel (p2g3d_grid), the update-mode
G2P, and the full substep at the BASELINE 3D scales.  Same methodology
as profile2d_loop.py: each stage runs REPS times inside one jitted
fori_loop so the ~30 ms tunnel round-trip amortises away.

  BENCH_3D_SMALL=1  1M / 128^3 (default: 8M / 256^3)
"""

from __future__ import annotations

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.models import fast3d, scenes
from mpm_flip98a_tpu.models.stabilized import PAD
from mpm_flip98a_tpu.ops.pallas import transfer3d as tk3

sys.path.insert(0, ".")
from scripts.profile2d_loop import timeit_loop  # noqa: E402

REPS = 10


def main():
    if os.environ.get("BENCH_3D_SMALL") == "1":
        p, scene = scenes.slab_3d()
    else:
        p, scene = scenes.slab_3d(num_grids=256, particles_per_axis=(512, 512, 32))
    cfg = scene.cfg
    spec = fast3d.FastSpec3D.for_particles(cfg, p, headroom=1.5)
    b = jax.jit(lambda q: fast3d.from_particles(q, cfg, spec))(p)
    r0, r1, k = spec.rows0, spec.rows1, spec.capacity
    g, dx = cfg.num_grids, float(cfg.dx)
    dinv = float(4.0 * cfg.inv_dx * cfg.inv_dx)
    print(f"N={p.n} G={g} K={k}", flush=True)

    shaped = lambda a: a.reshape(r0, r1, k)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    invf, padf = jnp.float32(cfg.inv_dx), jnp.float32(PAD)
    gxs = (
        shaped(b.x0 * invf + padf), shaped(b.x1 * invf + padf),
        shaped(b.x2 * invf + padf),
    )
    cmat = [getattr(b, f"C{a}{c}") for a in range(3) for c in range(3)]
    fields = (
        *gxs, shaped(b.v0), shaped(b.v1), shaped(b.v2),
        *(shaped(c) for c in cmat),
        shaped(b.J), shaped(b.mass), shaped(b.vol0),
    )
    kw = dict(
        apic=False, stress="tait",
        kb=float(scene.params.bulk_modulus),
        mu=float(scene.params.dynamic_viscosity),
        gamma=float(scene.params.tait_gamma), fa=float(-cfg.dt * dinv),
    )
    grav = tuple(float(x) for x in cfg.gravity_acceleration(scene.physics))
    p2gg = lambda f0: tk3.p2g3d_grid(
        (f0, *fields[1:]), counts, r1, g, dx, **kw,
        dt=float(cfg.dt), grav=grav, floor=float(scene.mass_floor),
        lo=int(PAD), hi=g - 1 - int(PAD), wall=scene.wall.kind, beta=0.0,
    )
    print(f"p2g3d_grid  : {timeit_loop(p2gg, gxs[0], reps=REPS)*1e3:8.2f} ms",
          flush=True)
    grid_pad = jax.jit(p2gg)(gxs[0])

    g2p = lambda gp: tk3.g2p3d(
        *gxs, shaped(b.mask), counts, gp, dx, dinv,
        state=(shaped(b.v0), shaped(b.v1), shaped(b.v2), shaped(b.J),
               shaped(b.x0), shaped(b.x1), shaped(b.x2)),
        alpha=float(cfg.flip_blend), dtv=float(cfg.dt),
        prepadded0=True, prepadded1=True,
    )
    print(f"g2p3d       : {timeit_loop(g2p, grid_pad, reps=REPS)*1e3:8.2f} ms",
          flush=True)

    t = timeit_loop(
        lambda x0: fast3d.substep(
            dataclasses.replace(b, x0=x0), scene, spec
        ),
        b.x0, reps=REPS,
    )
    print(
        f"full substep: {t*1e3:8.2f} ms -> {p.n * 54 / t / 1e9:.3f} e9",
        flush=True,
    )


if __name__ == "__main__":
    main()
