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
    """Restore a checkpoint written by `save` into `state_type`.

    Forward-compatible with added state fields: a checkpoint written
    before `Particles.Jp` existed loads with Jp = 1 (the inert value for
    every non-snow material) instead of failing — keeps old run
    checkpoints resumable across the round-4 state extension."""
    with np.load(_npz_path(path), allow_pickle=False) as z:
        manifest = json.loads(str(z["__manifest__"]))
        if manifest["type"] != state_type.__name__:
            raise ValueError(
                f"checkpoint holds {manifest['type']}, requested {state_type.__name__}"
            )
        kwargs = {
            name: jnp.asarray(z[name]) for name in manifest["fields"]
        }
    missing = {
        f.name for f in dataclasses.fields(state_type)
    } - set(kwargs)
    if missing == {"Jp"}:
        kwargs["Jp"] = jnp.ones_like(kwargs["J"])
    return state_type(**kwargs)


def load_meta(path: str) -> dict:
    with np.load(_npz_path(path), allow_pickle=False) as z:
        return json.loads(str(z["__manifest__"]))["meta"]


# ---------------------------------------------------------------------------
# Sharded (Orbax) checkpoints — pod-scale path
# ---------------------------------------------------------------------------
#
# The npz path above gathers the whole state to the host — fine on one
# chip, a bottleneck at pod scale where the bucket state is sharded over
# the mesh.  These write per-shard with Orbax (each chip serialises its
# own slices) and restore onto a TEMPLATE pytree carrying the target
# shardings, so no host-side gather or re-placement copy happens.


def save_sharded(path: str, state: Any, meta: dict | None = None) -> None:
    """Per-shard Orbax checkpoint of a (possibly sharded) pytree at the
    DIRECTORY `path`; `meta` rides a JSON sidecar next to it."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    with open(path + ".meta.json", "w") as f:
        json.dump({"type": type(state).__name__, "meta": meta or {}}, f)


def load_sharded(path: str, template: Any) -> Any:
    """Restore an Orbax checkpoint onto `template` — a matching pytree of
    arrays or ShapeDtypeStructs whose shardings define the placement
    (e.g. the freshly `distribute`d state on the target mesh).

    Forward-compatible with the round-4 `Jp` state extension like the
    npz `load`: a pre-Jp checkpoint restores as a dict without the Jp
    leaf, which is then filled with the inert value (ones like J, placed
    like the template's Jp)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    def _abstract(a):
        return jax.ShapeDtypeStruct(
            a.shape, a.dtype, sharding=getattr(a, "sharding", None)
        )

    abstract = jax.tree.map(_abstract, template)
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(os.path.abspath(path), abstract)
    except Exception:
        if not (_dc.is_dataclass(template) and hasattr(template, "Jp")):
            raise
        # Retry as a dict tree WITHOUT Jp (the pre-round-4 field set).
        fields = {
            f.name: _abstract(getattr(template, f.name))
            for f in _dc.fields(template)
            if f.name != "Jp"
        }
        got = ckptr.restore(os.path.abspath(path), fields)
        jp = jnp.ones_like(got["J"])
        tpl_jp = getattr(template, "Jp", None)
        if tpl_jp is not None and getattr(tpl_jp, "sharding", None) is not None:
            jp = jax.device_put(jp, tpl_jp.sharding)
        return type(template)(**got, Jp=jp)


def load_sharded_meta(path: str) -> dict:
    with open(os.path.abspath(path) + ".meta.json") as f:
        return json.load(f)["meta"]
