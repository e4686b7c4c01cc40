"""Checkpoint / resume for simulation state.

The reference has no checkpointing in its solver path (its taichi.h ships a
`.tcb` BinarySerializer, taichi.h:5318-5760, that nothing calls; per-frame
VTK dumps are the de-facto restart data — SURVEY.md section 5).  Here the
full particle/grid pytree state checkpoints to a single compressed npz with
a dtype/shape manifest, and restores to the exact pytree type.  Works for
`Particles`, `MLS88Particles`, `FluidBuckets` and any registered-dataclass
pytree of arrays.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Type

import numpy as np
import jax.numpy as jnp


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' when missing — normalise so save('ck') and
    load('ck') refer to the same file."""
    return path if path.endswith(".npz") else path + ".npz"


def save(path: str, state: Any, meta: dict | None = None) -> None:
    """Write a pytree-dataclass of arrays to `<path>` (npz)."""
    path = _npz_path(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fields = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
    }
    manifest = {
        "type": type(state).__name__,
        "meta": meta or {},
        "fields": {k: [str(v.dtype), list(v.shape)] for k, v in fields.items()},
    }
    np.savez_compressed(path, __manifest__=json.dumps(manifest), **fields)


def load(path: str, state_type: Type) -> Any:
    """Restore a checkpoint written by `save` into `state_type`."""
    with np.load(_npz_path(path), allow_pickle=False) as z:
        manifest = json.loads(str(z["__manifest__"]))
        if manifest["type"] != state_type.__name__:
            raise ValueError(
                f"checkpoint holds {manifest['type']}, requested {state_type.__name__}"
            )
        kwargs = {
            name: jnp.asarray(z[name]) for name in manifest["fields"]
        }
    return state_type(**kwargs)


def load_meta(path: str) -> dict:
    with np.load(_npz_path(path), allow_pickle=False) as z:
        return json.loads(str(z["__manifest__"]))["meta"]
