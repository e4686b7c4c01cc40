"""Mesh helpers."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "x"
) -> Mesh:
    """1D device mesh over the grid-slab axis.

    MPM scales by spatial decomposition along one grid axis (SURVEY.md
    section 2.7); a single ICI ring axis is the natural layout.  Multi-axis
    meshes (slabs x pencils) can be layered later without changing callers.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))
