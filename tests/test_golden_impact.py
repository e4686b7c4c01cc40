"""Post-impact golden statistics at the TRUE reference scale
(VERDICT r3 item 7).

test_golden_reference.py pins the smooth PRE-impact fall (30k substeps);
a wall-contact regression specific to the 105^2 / dt = 1e-6 regime would
pass it.  This test replays a committed mid-run fixture (the particle
state just before the collapse front reaches the right wall, generated
once offline by scripts/gen_impact_fixture.py) ACROSS the first wall
impact and pins the post-impact statistics.

The fixture + fp64 deterministic CPU arithmetic keep the replay
bit-stable run-to-run; the tolerance absorbs XLA-version reassociation
drift amplified through the impact (pinned values regenerate with
scripts/gen_impact_fixture.py ONLY when physics legitimately change).
"""

import os

import numpy as np
import pytest

from mpm_flip98a_tpu.config import MPMConfig
from mpm_flip98a_tpu.models import scenes
from mpm_flip98a_tpu.models.stabilized import run
from mpm_flip98a_tpu.state import Particles
from mpm_flip98a_tpu.utils import checkpoint

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "impact_state")

# scripts/gen_impact_fixture.py output (fp64 CPU, 2026-08-18); fixture
# state at absolute substep 240,000, front hits the right wall between
# +20k and +30k (front 0.4312 -> 0.4349 of the 0.4375 box).
GOLDEN_IMPACT = {
    10000: dict(com_x=0.14693945, com_y=0.01009705, std_x=0.09758821,
                std_y=0.00686318, front=0.41031357),
    20000: dict(com_x=0.15476348, com_y=0.00958750, std_x=0.10264997,
                std_y=0.00650934, front=0.43124810),
    30000: dict(com_x=0.16256928, com_y=0.00916022, std_x=0.10755557,
                std_y=0.00614741, front=0.43486698),
}
TOL = 1e-4


def _stats(x):
    return dict(
        com_x=float(x[:, 0].mean()),
        com_y=float(x[:, 1].mean()),
        std_x=float(x[:, 0].std()),
        std_y=float(x[:, 1].std()),
        front=float(x[:, 0].max()),
    )


@pytest.mark.skipif(
    not os.path.exists(FIXTURE + ".npz"),
    reason="impact fixture not generated (scripts/gen_impact_fixture.py)",
)
def test_reference_scale_impact_statistics():
    assert GOLDEN_IMPACT, "regenerate goldens with scripts/gen_impact_fixture.py"
    cfg = MPMConfig()  # the reference configuration, bit for bit
    _, scene = scenes.dam_break_2d(cfg)
    p = checkpoint.load(FIXTURE, Particles)
    meta = checkpoint.load_meta(FIXTURE)
    done = 0
    wall_x = cfg.domain_length
    impacted = False
    for steps, want in sorted(GOLDEN_IMPACT.items()):
        p = run(p, scene, steps - done)
        done = steps
        got = _stats(np.asarray(p.x))
        impacted = impacted or got["front"] > 0.97 * wall_x
        for k, v in want.items():
            assert abs(got[k] - v) < TOL, (
                f"step +{steps} (abs {meta['substeps'] + steps}) {k}: "
                f"{got[k]:.8f} != {v:.8f}"
            )
    # The window must actually cross the wall impact, or this test
    # guards nothing the pre-impact golden doesn't.
    assert impacted
