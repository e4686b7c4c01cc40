"""Golden-statistics regression at the TRUE reference configuration.

test_golden_trajectory.py pins a toy scene (37-node grid, dt = 4e-5);
this test pins the flagship physics at the reference's own scale
(/root/reference/config.py:24-39 == MPMConfig's defaults): 105^2 grid,
dt = 1e-6, 65 x 130 particles, APIC + B-spline, general path, fp64.
Frames are 10k substeps (frame_rate = 1e-2 s); the first three frames'
center of mass / spread / front position are pinned, so a regression in
the reference-scale physics fails CI even when the toy scene stays
within tolerance.

~2.5 min on CPU (30k substeps at ~4.8 ms each) — the single most
expensive test, and deliberately so: it is the reference's acceptance
scene (output.gif, reference README.md:29-35) in numerical form.

Regenerate with scripts/regen_golden.py ONLY when physics legitimately
change, and justify the change in the commit message.
"""

import numpy as np

from mpm_flip98a_tpu.config import MPMConfig
from mpm_flip98a_tpu.models import scenes
from mpm_flip98a_tpu.models.stabilized import run
from mpm_flip98a_tpu.utils import diagnostics

# fp64 deterministic CPU values (scripts/regen_golden.py, 2026-08-17).
GOLDEN_REFERENCE = {
    10000: dict(com_x=0.02861624, com_y=0.05665837, std_x=0.01651807, front=0.05723588),
    20000: dict(com_x=0.02898977, com_y=0.05567413, std_x=0.01672892, front=0.05909730),
    30000: dict(com_x=0.02964613, com_y=0.05408680, std_x=0.01711508, front=0.06209041),
}
# 30k substeps of smooth early fall are pre-chaotic: run-to-run fp noise
# is ~1e-12, XLA-version reassociation drift ~1e-8; physics bugs move
# centimetre-scale statistics by >> 1e-5 m.
TOL = 1e-5


def _stats(x):
    return dict(
        com_x=float(x[:, 0].mean()),
        com_y=float(x[:, 1].mean()),
        std_x=float(x[:, 0].std()),
        front=float(x[:, 0].max()),
    )


def test_reference_scene_statistics_match_golden():
    cfg = MPMConfig()  # the reference configuration, bit for bit
    assert cfg.num_grids == 105 and cfg.dt == 1e-6 and cfg.dtype == "float64"
    p, scene = scenes.dam_break_2d(cfg)
    mass0 = float(np.asarray(p.mass).sum())
    done = 0
    for steps, want in sorted(GOLDEN_REFERENCE.items()):
        p = run(p, scene, steps - done)
        done = steps
        got = _stats(np.asarray(p.x))
        for k, v in want.items():
            assert abs(got[k] - v) < TOL, f"step {steps} {k}: {got[k]:.8f} != {v:.8f}"
        diagnostics.check(p, mass0)
