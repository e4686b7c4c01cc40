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


def emit(cfg, checkpoints, label):
    p, scene = scenes.dam_break_2d(cfg)
    done = 0
    print(f"{label} = {{")
    for steps in checkpoints:
        p = run(p, scene, steps - done)
        done = steps
        x = np.asarray(p.x)
        print(
            f"    {steps}: dict(com_x={x[:,0].mean():.8f}, com_y={x[:,1].mean():.8f}, "
            f"std_x={x[:,0].std():.8f}, front={x[:,0].max():.8f}),",
            flush=True,
        )
    print("}")


def main():
    emit(CFG, (1000, 3000, 5000), "GOLDEN")
    # The TRUE reference configuration (reference config.py:24-39 —
    # MPMConfig's defaults): 105^2 grid, dt = 1e-6, 65 x 130 particles,
    # APIC + B-spline.  Frames are 10k substeps (frame_rate 1e-2 s);
    # pin the first three frames (tests/test_golden_reference.py).
    emit(MPMConfig(), (10000, 20000, 30000), "GOLDEN_REFERENCE")


if __name__ == "__main__":
    main()
