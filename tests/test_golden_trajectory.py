"""Golden-trajectory regression: dam-break ensemble statistics snapshot.

The reference's acceptance criterion is the stable dam-break evolution in
output.gif (README.md:29-35).  A GIF can't be diffed numerically, so this
test pins the evolution with a statistics table captured from the validated
solver (fp64, deterministic CPU): center of mass, spread, front position at
fixed frames.  Any physics regression moves these far beyond the pinned
tolerance; fp reassociation does not."""

import numpy as np

from mpm_flip98a_tpu.config import MPMConfig
from mpm_flip98a_tpu.models import scenes
from mpm_flip98a_tpu.models.stabilized import run
from mpm_flip98a_tpu.utils import diagnostics

CFG = MPMConfig(num_grids=37, dt=4e-5, num_particles_x=16, num_particles_y=32)

# Captured from the validated solver at the listed substep counts
# (fp64; regenerate with scripts/regen_golden.py if physics legitimately
# change — and justify the change in the commit).
GOLDEN = {
    1000: dict(com_x=0.030807, com_y=0.052438, std_x=0.017623, front=0.063026),
    3000: dict(com_x=0.054995, com_y=0.028515, std_x=0.033068, front=0.132286),
    5000: dict(com_x=0.105625, com_y=0.014577, std_x=0.066724, front=0.270165),
}
TOL = 2e-3  # metres; chaotic fp noise stays ~1e-5, physics bugs >> 1e-3


def _stats(x):
    return dict(
        com_x=float(x[:, 0].mean()),
        com_y=float(x[:, 1].mean()),
        std_x=float(x[:, 0].std()),
        front=float(x[:, 0].max()),
    )


def test_dam_break_statistics_match_golden():
    p, scene = scenes.dam_break_2d(CFG)
    mass0 = float(np.asarray(p.mass).sum())
    done = 0
    for steps, want in sorted(GOLDEN.items()):
        p = run(p, scene, steps - done)
        done = steps
        got = _stats(np.asarray(p.x))
        for k, v in want.items():
            assert abs(got[k] - v) < TOL, f"step {steps} {k}: {got[k]:.6f} != {v:.6f}"
        diagnostics.check(p, mass0)
