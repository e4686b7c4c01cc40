"""Generate the post-impact golden fixture (VERDICT r3 item 7).

Runs the TRUE reference configuration (105^2, dt = 1e-6, fp64, general
path — same scene as tests/test_golden_reference.py) until the collapse
front approaches the right wall, saves the particle state as a committed
fixture (tests/data/impact_state.npz), then continues through the wall
impact and prints the post-impact golden statistics for
tests/test_golden_impact.py to pin.

One-shot offline tool (~20 min CPU); the TEST only replays the fixture
across the impact window (~2-3 min), keeping CI cost sane.
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mpm_flip98a_tpu.config import MPMConfig
from mpm_flip98a_tpu.models import scenes
from mpm_flip98a_tpu.models.stabilized import run
from mpm_flip98a_tpu.utils import checkpoint

CHUNK = 10_000
FRONT_TRIGGER = 0.40   # save the state of the chunk BEFORE the front passes this
POST_CHUNKS = 4        # chunks to run past the fixture for golden stats

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "impact_state",
)


def _stats(x):
    return dict(
        com_x=float(x[:, 0].mean()),
        com_y=float(x[:, 1].mean()),
        std_x=float(x[:, 0].std()),
        std_y=float(x[:, 1].std()),
        front=float(x[:, 0].max()),
    )


def main():
    cfg = MPMConfig()
    assert cfg.num_grids == 105 and cfg.dt == 1e-6 and cfg.dtype == "float64"
    p, scene = scenes.dam_break_2d(cfg)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)

    done = 0
    prev = p
    while True:
        p = run(prev, scene, CHUNK)
        done += CHUNK
        s = _stats(np.asarray(p.x))
        print(f"substeps {done:7d}  front {s['front']:.5f}  com_x {s['com_x']:.5f}",
              flush=True)
        if s["front"] > FRONT_TRIGGER:
            fixture_step = done - CHUNK
            checkpoint.save(OUT, prev, meta={"substeps": fixture_step})
            print(f"fixture saved at substep {fixture_step} -> {OUT}.npz", flush=True)
            break
        if done > 600_000:
            raise RuntimeError("front never reached the trigger — check physics")
        prev = p

    # Continue from the fixture through the impact; print golden stats.
    q = checkpoint.load(OUT, type(prev))
    print("golden (steps after fixture -> stats):", flush=True)
    for i in range(1, POST_CHUNKS + 1):
        q = run(q, scene, CHUNK)
        s = _stats(np.asarray(q.x))
        print(f"  {i * CHUNK}: {s}", flush=True)


if __name__ == "__main__":
    main()
