"""Checkpoint forward-compatibility across the round-4 Jp state extension.

Pre-round-4 checkpoints (npz and per-shard Orbax) carry no `Jp` field;
both loaders must restore them with the inert value instead of failing,
so old run checkpoints stay resumable.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mpm_flip98a_tpu.state import Particles
from mpm_flip98a_tpu.utils import checkpoint


def _particles(n=16, d=2):
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.3, (n, d)))
    return Particles.init(x, volume0=1e-6, density=1000.0)


def test_npz_load_fills_missing_jp(tmp_path):
    p = _particles()
    path = str(tmp_path / "old_ck")
    # Simulate a pre-Jp checkpoint: save, then strip Jp from the archive.
    checkpoint.save(path, p, meta={"substeps": 7})
    import json

    with np.load(path + ".npz", allow_pickle=False) as z:
        manifest = json.loads(str(z["__manifest__"]))
        fields = {k: z[k] for k in manifest["fields"] if k != "Jp"}
    del manifest["fields"]["Jp"]
    np.savez_compressed(
        path + ".npz", __manifest__=json.dumps(manifest), **fields
    )

    got = checkpoint.load(path, Particles)
    np.testing.assert_array_equal(np.asarray(got.Jp), 1.0)
    np.testing.assert_array_equal(np.asarray(got.x), np.asarray(p.x))
    assert checkpoint.load_meta(path)["substeps"] == 7


def test_orbax_load_sharded_fills_missing_jp(tmp_path):
    p = _particles()
    path = str(tmp_path / "old_orbax")
    # A pre-Jp Orbax checkpoint == a dict tree without the Jp leaf.
    pre_jp = {
        f.name: getattr(p, f.name)
        for f in dataclasses.fields(p)
        if f.name != "Jp"
    }
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, pre_jp, force=True)
    ckptr.wait_until_finished()

    got = checkpoint.load_sharded(path, p)
    assert isinstance(got, Particles)
    np.testing.assert_array_equal(np.asarray(got.Jp), 1.0)
    np.testing.assert_array_equal(np.asarray(got.x), np.asarray(p.x))


def test_orbax_round_trip_with_jp(tmp_path):
    p = _particles()
    p = dataclasses.replace(p, Jp=p.Jp * 0.8)
    path = str(tmp_path / "new_orbax")
    checkpoint.save_sharded(path, p, meta={"k": 1})
    got = checkpoint.load_sharded(path, p)
    np.testing.assert_allclose(np.asarray(got.Jp), 0.8, rtol=1e-7)
    assert checkpoint.load_sharded_meta(path)["k"] == 1
