"""Multi-chip fast path (particle DP + psum'd grid) vs single-device fast path."""

import dataclasses

import numpy as np

from mpm_flip98a_tpu.config import MPMConfig
from mpm_flip98a_tpu.models import fast2d, scenes
from mpm_flip98a_tpu.parallel import make_mesh
from mpm_flip98a_tpu.parallel import fast_replicated as fr

FAST = MPMConfig(
    dtype="float32", num_grids=37, dt=2e-5, num_particles_x=16, num_particles_y=32
)


def _sorted(x):
    return x[np.lexsort((x[:, 1], x[:, 0]))]


def test_fast_dp_matches_single_device():
    p, scene = scenes.dam_break_2d(FAST, dtype=np.float32)
    mesh = make_mesh(4)
    b8, spec8 = fr.distribute(p, FAST, mesh)
    out8 = fr.make_run(scene, spec8, mesh)(b8, 30)

    spec1 = fast2d.FastSpec.for_particles(FAST, p, headroom=2.0)
    out1 = fast2d.run(fast2d.from_particles(p, FAST, spec1), scene, spec1, 30)

    x8 = _sorted(fr.collect_positions(out8))
    h1 = fast2d.to_host(out1)
    x1 = _sorted(np.stack([h1["x0"], h1["x1"]], axis=-1))
    assert x8.shape == x1.shape == (p.n, 2)
    np.testing.assert_allclose(x8, x1, atol=1e-6)
    assert int(np.asarray(out8.overflow).sum()) == 0
