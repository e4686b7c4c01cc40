"""Measure the cost of EMPTY row-buckets in the 2D kernels (ROADMAP item
6, sparse grids): time p2g_fused / g2p / p2g_grid with the real
dam-break counts vs counts forced to zero (every program takes the
chunk-skip fast exit, only the mandatory output-block writes remain).

The delta bounds what any active-row compaction scheme could save: the
in-body chunk skip already makes dead rows nearly free if the delta is
small relative to the stage time.
"""

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
from scripts.profile2d_loop import timeit_loop  # noqa: E402


def main():
    p, scene = build_workload(False)
    cfg = scene.cfg
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=1.5)
    b = jax.jit(lambda q: fast2d.from_particles(q, cfg, spec))(p)
    g = cfg.num_grids
    dx = float(cfg.dx)
    dinv = float(4.0 * cfg.inv_dx * cfg.inv_dx)
    inv_dx = jnp.float32(cfg.inv_dx)
    gx0 = b.x0 * inv_dx + jnp.float32(PAD)
    gx1 = b.x1 * inv_dx + jnp.float32(PAD)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    nact = int(jnp.sum(counts > 0))
    print(f"N={p.n} G={g} K={spec.capacity} active rows {nact}/{spec.rows}",
          flush=True)
    zcounts = jnp.zeros_like(counts)

    sdata = jnp.stack(
        [gx0, gx1, b.v0, b.v1, b.C00, b.C01, b.C10, b.C11, b.J, b.mass,
         b.vol0], axis=1)
    for name, cts in (("real", counts), ("zero", zcounts)):
        p2gg = lambda sd, c=cts: fast2d._p2g_grid(
            sd, c, scene, fused=True, tent=False, apic=False, eos="tait"
        )
        t = timeit_loop(p2gg, sdata)
        print(f"p2g_grid[{name}] : {t*1e3:7.3f} ms", flush=True)
        if name == "real":
            grid4 = jax.jit(p2gg)(sdata)

    pdata2 = jnp.stack([gx0, gx1, b.mask], axis=1)
    for name, cts in (("real", counts), ("zero", zcounts)):
        g2ps = lambda pd, c=cts: tk.g2p(pd, c, grid4, dx, dinv, prepadded=True)
        print(f"g2p[{name}]       : {timeit_loop(g2ps, pdata2)*1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
