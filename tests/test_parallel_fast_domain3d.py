"""3D slab-sharded Pallas fast path on the virtual CPU mesh.

Same contract as the 2D version (tests/test_parallel_fast_domain.py):
exact agreement with the single-device fast path at short horizons,
migration + zero loss over longer ones.  Interpret-mode 3D kernels are
slow, so shapes and horizons stay tiny.
"""

import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.models import fast3d, scenes
from mpm_flip98a_tpu.parallel import make_mesh, make_mesh2
from mpm_flip98a_tpu.parallel.fast_domain3d import (
    FastDomain3DSpec,
    distribute,
    make_run,
)


def _setup(n_shards=4, **cfg_kwargs):
    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-5,
        dtype=np.float32, **cfg_kwargs,
    )
    mesh = make_mesh(n_shards)
    spec = FastDomain3DSpec.for_particles(scene.cfg, n_shards, p, headroom=2.0)
    b = distribute(p, scene.cfg, spec, mesh)
    return p, scene, mesh, spec, b


def _single(p, scene, n):
    spec1 = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    return fast3d.run(
        fast3d.from_particles(p, scene.cfg, spec1), scene, spec1, n
    )


def _sorted_xyz(b):
    h = fast3d.to_host(b)
    x = np.stack([h["x0"], h["x1"], h["x2"]], axis=-1)
    order = np.lexsort((x[:, 2], x[:, 1], x[:, 0]))
    return x[order]


def test_short_run_matches_single_fast3d():
    p, scene, mesh, spec, b = _setup()
    out = make_run(scene, spec, mesh)(b, 4)
    ref = _single(p, scene, 4)
    x, xr = _sorted_xyz(out), _sorted_xyz(ref)
    assert x.shape == xr.shape == (p.n, 3)
    np.testing.assert_allclose(x, xr, atol=1e-6)
    assert int(np.asarray(out.overflow).sum()) == 0


def test_migrating_run_with_rebucket():
    # An initial axis-0 velocity pushes particles across a slab boundary
    # within the horizon, forcing the collective rebucket + migration.
    p, scene, mesh, spec, b0 = _setup()
    # 6 m/s * 60 * 2e-4 s = 1.15 cells of axis-0 drift: crosses the
    # 0.8-cell rebucket trigger, and the column straddles shard
    # boundaries so some slots must migrate.
    v0 = jnp.zeros_like(p.v).at[:, 0].set(6.0)
    p = dc.replace(p, v=v0)
    cfg = dc.replace(scene.cfg, dt=2e-4)
    scene = dc.replace(scene, cfg=cfg)
    b = distribute(p, scene.cfg, spec, mesh)
    out = make_run(scene, spec, mesh)(b, 60)
    ref = _single(p, scene, 60)
    assert int(np.asarray(out.overflow).sum()) == 0
    x, xr = _sorted_xyz(out), _sorted_xyz(ref)
    assert x.shape[0] == p.n
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x.mean(axis=0), xr.mean(axis=0), atol=5e-4)
    # Shard occupancy changed: migration actually happened.
    m0 = (np.asarray(b.mask) > 0).reshape(spec.n_shards, -1).sum(1)
    m1 = (np.asarray(out.mask) > 0).reshape(spec.n_shards, -1).sum(1)
    assert (m0 != m1).any()


def test_multimaterial_sharded_matches_single():
    # The generic (non-fused) kernel mode under the slab decomposition.
    p, scene = scenes.elastic_drop_3d()
    mesh = make_mesh(4)
    spec = FastDomain3DSpec.for_particles(scene.cfg, 4, p, headroom=2.0)
    b = distribute(p, scene.cfg, spec, mesh)
    out = make_run(scene, spec, mesh)(b, 4)
    ref = _single(p, scene, 4)
    np.testing.assert_allclose(_sorted_xyz(out), _sorted_xyz(ref), atol=1e-6)
    assert int(np.asarray(out.overflow).sum()) == 0


def _setup2(shards=(2, 4), **cfg_kwargs):
    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-5,
        dtype=np.float32, **cfg_kwargs,
    )
    mesh = make_mesh2(*shards)
    spec = FastDomain3DSpec.for_particles(scene.cfg, shards, p, headroom=2.0)
    b = distribute(p, scene.cfg, spec, mesh)
    return p, scene, mesh, spec, b


def test_two_axis_short_run_matches_single():
    # 2 x 4 mesh: slabs on axis 0, pencil columns on axis 1 (halo1 P2G
    # mode + two-axis halo exchange incl. the corner-completing order).
    p, scene, mesh, spec, b = _setup2()
    out = make_run(scene, spec, mesh)(b, 4)
    ref = _single(p, scene, 4)
    x, xr = _sorted_xyz(out), _sorted_xyz(ref)
    assert x.shape == xr.shape == (p.n, 3)
    np.testing.assert_allclose(x, xr, atol=1e-6)
    assert int(np.asarray(out.overflow).sum()) == 0


def test_two_axis_migrating_run_with_rebucket():
    # Diagonal (axis-0 + axis-1) drift: slots cross BOTH shard-window
    # boundaries, so corner-crossing particles must reach the diagonal
    # neighbor through the two migration legs.
    p, scene, mesh, spec, b0 = _setup2()
    v0 = jnp.zeros_like(p.v).at[:, 0].set(6.0).at[:, 1].set(6.0)
    p = dc.replace(p, v=v0)
    cfg = dc.replace(scene.cfg, dt=2e-4)
    scene = dc.replace(scene, cfg=cfg)
    b = distribute(p, scene.cfg, spec, mesh)
    out = make_run(scene, spec, mesh)(b, 60)
    ref = _single(p, scene, 60)
    assert int(np.asarray(out.overflow).sum()) == 0
    x, xr = _sorted_xyz(out), _sorted_xyz(ref)
    assert x.shape[0] == p.n
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x.mean(axis=0), xr.mean(axis=0), atol=5e-4)
    m0 = (np.asarray(b.mask) > 0).reshape(spec.n_shards, -1).sum(1)
    m1 = (np.asarray(out.mask) > 0).reshape(spec.n_shards, -1).sum(1)
    assert (m0 != m1).any()


def test_two_axis_multimaterial_matches_single():
    # The generic (non-fused) kernel mode under the 2-axis decomposition
    # (multi-material dispatch + penalty EBC wall masks on both axes).
    p, scene = scenes.elastic_drop_3d()
    mesh = make_mesh2(2, 2)
    spec = FastDomain3DSpec.for_particles(scene.cfg, (2, 2), p, headroom=2.0)
    b = distribute(p, scene.cfg, spec, mesh)
    out = make_run(scene, spec, mesh)(b, 4)
    ref = _single(p, scene, 4)
    np.testing.assert_allclose(_sorted_xyz(out), _sorted_xyz(ref), atol=1e-6)
    assert int(np.asarray(out.overflow).sum()) == 0


def test_fused_stabilizers_sharded_matches_single():
    # ext channels (F-bar + pressure mixing) through the generic kernel
    # mode under the slab decomposition: the nodal-average ratios must be
    # formed AFTER the halo completes the sums.
    p, scene, mesh, spec, b = _setup(use_fbar=True, pressure_mixing_ratio=0.5)
    out = make_run(scene, spec, mesh)(b, 4)
    ref = _single(p, scene, 4)
    np.testing.assert_allclose(_sorted_xyz(out), _sorted_xyz(ref), atol=1e-6)
    assert int(np.asarray(out.overflow).sum()) == 0
