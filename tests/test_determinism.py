"""Bit-exact determinism: identical runs produce identical states.

The reference relies on Taichi's atomic-scatter semantics (SURVEY.md
section 5: no race detection anywhere); this framework is deterministic by
construction — cell-ordered scatters, fixed reduction orders in the
kernels — so two runs of the same program must agree to the last bit.
That property is what makes every cross-implementation tolerance in this
suite meaningful.
"""

import numpy as np

from mpm_flip98a_tpu.config import MPMConfig
from mpm_flip98a_tpu.models import fast2d, scenes
from mpm_flip98a_tpu.models.stabilized import run as run_general

FAST = MPMConfig(
    dtype="float32", num_grids=37, dt=2e-5, num_particles_x=16, num_particles_y=32
)


def test_general_path_bit_exact():
    p, scene = scenes.dam_break_2d(FAST, dtype=np.float32)
    a = run_general(p, scene, 100)
    b = run_general(p, scene, 100)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    np.testing.assert_array_equal(np.asarray(a.v), np.asarray(b.v))


def test_fast_path_bit_exact():
    p, scene = scenes.dam_break_2d(FAST, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(FAST, p, headroom=2.0)
    b0 = fast2d.from_particles(p, FAST, spec)
    a = fast2d.run(b0, scene, spec, 100)
    b = fast2d.run(b0, scene, spec, 100)
    np.testing.assert_array_equal(np.asarray(a.x0), np.asarray(b.x0))
    np.testing.assert_array_equal(np.asarray(a.v0), np.asarray(b.v0))
