"""Diagnose the multi-material 3D fast path on the current backend.

Runs the elastic-drop 64^3 scene substep-by-substep in growing batches,
reporting finiteness and J bounds; saves the 1-substep state for
cross-backend comparison.

Usage: python scripts/diag_mm3d.py [out.npz]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.models import fast3d, scenes


def stats(b, tag):
    h = fast3d.to_host(b)
    x = np.stack([h["x0"], h["x1"], h["x2"]], -1)
    fin = np.isfinite(x).all() and np.isfinite(h["v0"]).all()
    print(
        f"{tag}: finite={fin} n={x.shape[0]} |J-1|max={np.abs(h['J']-1).max():.4g} "
        f"|v|max={max(np.abs(h[k]).max() for k in ('v0','v1','v2')):.4g} "
        f"overflow={int(np.asarray(b.overflow))}",
        flush=True,
    )
    return fin


def main():
    p, scene = scenes.elastic_drop_3d(
        num_grids=64, fluid_particles=(48, 48, 16), block_particles=(16, 16, 16),
        dt=1e-5,
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p)
    b = fast3d.from_particles(p, scene.cfg, spec)
    print(f"backend={jax.default_backend()} K={spec.capacity}", flush=True)
    b1 = fast3d.substep(b, scene, spec)
    stats(b1, "substep 1")
    if len(sys.argv) > 1:
        h = fast3d.to_host(b1)
        np.savez(sys.argv[1], **h)
        print("saved", sys.argv[1], flush=True)
    bb = b
    total = 0
    for n in (10, 40, 50, 100, 100, 200):
        bb = fast3d.run(bb, scene, spec, n)
        total += n
        if not stats(bb, f"substep {total}"):
            break


if __name__ == "__main__":
    main()
