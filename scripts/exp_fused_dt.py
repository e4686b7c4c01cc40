"""Experiment: fused F-bar + pressure-mixing stability vs dt (CPU).

Round-1 finding: both stabilizers together halve the stable dt (CFL ~0.15
vs ~0.3 for each alone).  Hypothesis: the one-substep lag on the nodal
averages acts as delayed feedback on the acoustic oscillation; a
first-order predictor (advance jbar_s / p_s by their known local rates)
should recover the full stability region.

Usage: python scripts/exp_fused_dt.py [dt] [n_substeps]
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from mpm_flip98a_tpu.config import MPMConfig, TransferKind  # noqa: E402
from mpm_flip98a_tpu.models import fast2d, scenes  # noqa: E402

dt = float(sys.argv[1]) if len(sys.argv) > 1 else 4e-5
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

cfg = MPMConfig(
    dtype="float32",
    num_grids=37,
    dt=dt,
    num_particles_x=16,
    num_particles_y=32,
    flip_blend=0.98,
    transfer=TransferKind.PIC,
    use_fbar=True,
    pressure_mixing_ratio=0.5,
)
p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
b = fast2d.from_particles(p, cfg, spec)
chunk = 200
for i in range(0, n, chunk):
    b = fast2d.run(b, scene, spec, chunk)
    h = fast2d.to_host(b)
    x = np.stack([h["x0"], h["x1"]], -1)
    jmax = float(np.abs(h["J"] - 1).max())
    vmax = float(max(np.abs(h["v0"]).max(), np.abs(h["v1"]).max()))
    finite = bool(np.isfinite(x).all() and np.isfinite(h["v0"]).all())
    print(
        f"substep {i + chunk:5d}: finite={finite} |J-1|max={jmax:.4f} "
        f"|v|max={vmax:.3f} overflow={int(b.overflow)}",
        flush=True,
    )
    if not finite or jmax > 1.0:
        print("DIVERGED")
        sys.exit(1)
print("STABLE")
