"""Regenerate the golden dam-break statistics table
(tests/test_golden_trajectory.py).  Run on CPU in fp64:

    JAX_PLATFORMS=cpu python scripts/regen_golden.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from mpm_flip98a_tpu.config import MPMConfig
from mpm_flip98a_tpu.models import scenes
from mpm_flip98a_tpu.models.stabilized import run

CFG = MPMConfig(num_grids=37, dt=4e-5, num_particles_x=16, num_particles_y=32)


def main():
    p, scene = scenes.dam_break_2d(CFG)
    done = 0
    print("GOLDEN = {")
    for steps in (1000, 3000, 5000):
        p = run(p, scene, steps - done)
        done = steps
        x = np.asarray(p.x)
        print(
            f"    {steps}: dict(com_x={x[:,0].mean():.6f}, com_y={x[:,1].mean():.6f}, "
            f"std_x={x[:,0].std():.6f}, front={x[:,0].max():.6f}),"
        )
    print("}")


if __name__ == "__main__":
    main()
