"""Sparse-scene throughput: the reference-SHAPED dam column (narrow in
the bucket-row axis) vs the bench pool (98% of rows occupied), same
N=1M, G=513.  The row-bucket `counts` chunk skip IS the active-row
skipping mechanism (ROADMAP item 6): empty rows cost ~3 us (out-block
memset + DMA + 4 chunk predicates) vs ~8 us for a full row, so a scene
that occupies a quarter of the rows should run substeps substantially
faster than the dense pool without any extra machinery.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.config import MPMConfig, TransferKind
from mpm_flip98a_tpu.models import fast2d, scenes

import sys
sys.path.insert(0, ".")
from scripts.profile2d_loop import timeit_loop  # noqa: E402


def run_one(name, cfg):
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=1.5)
    b = jax.jit(lambda q: fast2d.from_particles(q, cfg, spec))(p)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    nact = int(jnp.sum(counts > 0))
    t = timeit_loop(
        lambda x0: fast2d.substep(
            __import__("dataclasses").replace(b, x0=x0), scene
        ),
        b.x0,
    )
    rate = p.n * 18 / t / 1e9
    print(
        f"{name:8s}: active rows {nact:3d}/{spec.rows}  K={spec.capacity}"
        f"  substep {t*1e3:6.3f} ms  {rate:.3f} e9 ops/s",
        flush=True,
    )


def main():
    common = dict(
        dtype="float32", num_grids=513, dt=2e-6,
        flip_blend=0.98, transfer=TransferKind.PIC,
    )
    # Bench pool: 98% of rows, half the columns.
    run_one("pool", MPMConfig(
        num_particles_x=2000, num_particles_y=500,
        fluid_width=0.430, fluid_height=0.215, **common))
    # Reference-shaped column at the left wall: ~25% of rows.
    run_one("column", MPMConfig(
        num_particles_x=500, num_particles_y=2000,
        fluid_width=0.108, fluid_height=0.425, **common))


if __name__ == "__main__":
    main()
