"""3D fast-path throughput at the full BASELINE 8M/256^3 scale.

Usage: python scripts/bench3d_full.py [n_substeps] [small]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.models import fast3d, scenes


def main():
    n_sub = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    small = len(sys.argv) > 2 and sys.argv[2] == "small"
    if small:
        p, scene = scenes.slab_3d()
    else:
        p, scene = scenes.slab_3d(num_grids=256, particles_per_axis=(512, 512, 32))
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=1.5)
    b = jax.jit(lambda p: fast3d.from_particles(p, scene.cfg, spec))(p)
    n_p = p.n
    p = None
    print(
        f"N={n_p} G={scene.cfg.num_grids} K={spec.capacity} substeps={n_sub}",
        flush=True,
    )
    t0 = time.perf_counter()
    b = fast3d.run(b, scene, spec, n_sub)
    float(jnp.sum(b.x0))
    print(f"compile+warm: {time.perf_counter() - t0:.1f} s", flush=True)

    t0 = time.perf_counter()
    b = fast3d.run(b, scene, spec, n_sub)
    float(jnp.sum(b.x0))
    elapsed = time.perf_counter() - t0
    assert int(np.asarray(b.overflow)) == 0, "overflow"
    assert bool(np.isfinite(float(jnp.sum(b.x0)))), "non-finite"
    value = n_p * 27 * 2 * n_sub / elapsed
    print(
        f"{elapsed:.3f} s for {n_sub} substeps -> {1e3 * elapsed / n_sub:.1f} "
        f"ms/substep, {value / 1e9:.3f} e9 transfer ops/s"
    )


if __name__ == "__main__":
    main()
