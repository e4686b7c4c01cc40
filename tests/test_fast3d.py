"""3D Pallas pencil-bucket path vs the general XLA stabilized solver.

Interpret mode on CPU is slow per program (R0 x R1 programs), so shapes
stay tiny; the physics contract is the same as 2D: same substep, faster.
"""

import numpy as np

from mpm_flip98a_tpu.models import fast3d, scenes
from mpm_flip98a_tpu.models.stabilized import run as run_ref


def _setup():
    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-5, dtype=np.float32
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b = fast3d.from_particles(p, scene.cfg, spec)
    return p, scene, spec, b


def _sorted(x):
    order = np.lexsort((x[:, 2], x[:, 1], x[:, 0]))
    return x[order]


def _dense(b):
    h = fast3d.to_host(b)
    return np.stack([h["x0"], h["x1"], h["x2"]], axis=-1)


def test_single_substep_matches_stabilized():
    p, scene, spec, b = _setup()
    b1 = fast3d.substep(b, scene, spec)
    p1 = run_ref(p, scene, 1)
    x_f = _sorted(_dense(b1))
    x_r = _sorted(np.asarray(p1.x))
    assert x_f.shape == x_r.shape
    np.testing.assert_allclose(x_f, x_r, atol=1e-7)
    assert int(b1.overflow) == 0


def test_multi_substep_tracks_stabilized():
    # Interpret mode executes per (i0, i1) program; keep the horizon short.
    p, scene, spec, b = _setup()
    b1 = fast3d.run(b, scene, spec, 4)
    p1 = run_ref(p, scene, 4)
    x_f = _sorted(_dense(b1))
    x_r = _sorted(np.asarray(p1.x))
    np.testing.assert_allclose(x_f, x_r, atol=1e-5)
    assert int(b1.overflow) == 0
    assert np.isfinite(x_f).all()
