"""Property tests for the closed-form decompositions.

Replicates the invariant checks of the reference's (disabled) self-test
`test_simple_decompositions` (reference: cpp_validation/taichi.h:8421-8453):
reconstruction, orthogonality, det = 1, symmetric S, ordered singular
values; tolerance 3e-5 for fp32, 1e-12 for fp64, on 10,000 random matrices.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mpm_flip98a_tpu.ops import mathx

N = 10_000


def _rand(dim, dtype, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((N, dim, dim)), dtype)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 3e-5), (jnp.float64, 1e-12)])
def test_polar_decomp_2d(dtype, tol):
    m = _rand(2, dtype)
    r, s = mathx.polar_decomp_2d(m)
    np.testing.assert_allclose(r @ s, m, atol=tol)
    np.testing.assert_allclose(r @ mathx.transpose(r), mathx.eye_like(m), atol=tol)
    np.testing.assert_allclose(mathx.det2x2(r), 1.0, atol=tol)
    np.testing.assert_allclose(s, mathx.transpose(s), atol=tol)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 3e-5), (jnp.float64, 1e-12)])
def test_svd_2d(dtype, tol):
    m = _rand(2, dtype, seed=1)
    u, sig, v = mathx.svd_2d(m)
    assert bool(jnp.all(sig[:, 0] + tol > jnp.abs(sig[:, 1])))
    recon = u @ (sig[..., :, None] * mathx.transpose(v))
    np.testing.assert_allclose(recon, m, atol=tol)
    np.testing.assert_allclose(u @ mathx.transpose(u), mathx.eye_like(m), atol=tol)
    np.testing.assert_allclose(v @ mathx.transpose(v), mathx.eye_like(m), atol=tol)
    np.testing.assert_allclose(mathx.det2x2(u), 1.0, atol=tol)
    np.testing.assert_allclose(mathx.det2x2(v), 1.0, atol=tol)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-4), (jnp.float64, 1e-9)])
def test_polar_decomp_3d(dtype, tol):
    # Deformation-gradient-like matrices: identity + perturbation.
    rng = np.random.default_rng(2)
    m = jnp.asarray(np.eye(3) + 0.5 * (rng.random((N, 3, 3)) - 0.5), dtype)
    r, s = mathx.polar_decomp_3d(m)
    np.testing.assert_allclose(r @ s, m, atol=tol)
    np.testing.assert_allclose(r @ mathx.transpose(r), mathx.eye_like(m), atol=tol)
    np.testing.assert_allclose(mathx.det3x3(r), 1.0, atol=tol)
    np.testing.assert_allclose(s, mathx.transpose(s), atol=tol)


@pytest.mark.parametrize("dtype,tol", [(jnp.float64, 1e-8)])
def test_svd_3d(dtype, tol):
    rng = np.random.default_rng(3)
    m = jnp.asarray(np.eye(3) + 0.5 * (rng.random((500, 3, 3)) - 0.5), dtype)
    u, sig, v = mathx.svd_3d(m)
    recon = u @ (sig[..., :, None] * mathx.transpose(v))
    np.testing.assert_allclose(recon, m, atol=tol)
    np.testing.assert_allclose(u @ mathx.transpose(u), mathx.eye_like(m), atol=tol)
    np.testing.assert_allclose(v @ mathx.transpose(v), mathx.eye_like(m), atol=tol)
    assert bool(jnp.all(sig[:, :-1] + tol >= sig[:, 1:]))


def test_det_matches_numpy():
    rng = np.random.default_rng(4)
    for d in (2, 3):
        m = rng.random((100, d, d))
        np.testing.assert_allclose(
            mathx.det(jnp.asarray(m)), np.linalg.det(m), rtol=1e-10
        )
