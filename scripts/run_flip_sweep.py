"""PIC/FLIP/APIC blend sweep on the dam-break (BASELINE.json configs[1]).

Runs alpha in {0, 0.5, 0.95, 0.98, 1.0} for the same simulated time and
prints the collapse statistics per blend — the numerical form of the
thesis' blend comparison.  alpha = 0 uses the APIC transfer; alpha > 0 the
standard FLIP pairing with PIC scatter.

    python scripts/run_flip_sweep.py [--substeps 20000] [--dt 1e-5]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mpm_flip98a_tpu.config import MPMConfig, TransferKind
from mpm_flip98a_tpu.models import fast2d, scenes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--substeps", type=int, default=20000)
    ap.add_argument("--dt", type=float, default=1e-5)
    args = ap.parse_args()

    print(f"{'alpha':>6} {'transfer':>8} {'front_x':>8} {'height':>8} "
          f"{'KE':>12} {'J_range':>18}")
    for alpha in (0.0, 0.5, 0.95, 0.98, 1.0):
        cfg = dataclasses.replace(
            MPMConfig(dtype="float32"),
            dt=args.dt,
            flip_blend=alpha,
            transfer=TransferKind.APIC if alpha == 0.0 else TransferKind.PIC,
        )
        p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
        spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
        b = fast2d.run(fast2d.from_particles(p, cfg, spec), scene, spec, args.substeps)
        h = fast2d.to_host(b)
        x = np.stack([h["x0"], h["x1"]], -1)
        v = np.stack([h["v0"], h["v1"]], -1)
        ke = float(0.5 * (h["mass"] * (v**2).sum(-1)).sum())
        assert np.isfinite(x).all(), f"alpha={alpha} diverged"
        print(
            f"{alpha:6.2f} {scene.cfg.transfer.value:>8} {x[:,0].max():8.4f} "
            f"{x[:,1].max():8.4f} {ke:12.5e} "
            f"[{h['J'].min():.4f}, {h['J'].max():.4f}]"
        )


if __name__ == "__main__":
    main()
