"""Component-form measurement models (ops/comp_factors.py) must equal the
row-major implementations in gbp_tpu/factors/ exactly."""
import numpy as np
import jax.numpy as jnp

from gbp_tpu.factors import reprojection
from gbp_tpu.ops.comp_factors import (
    bal_reprojection_normalized_comp,
    reprojection_normalized_comp,
)


def _tiles(arr):
    """[n, F] -> list of F [1, n] tiles (tiny stand-in for kernel tiles)."""
    return [arr[:, k][None, :] for k in range(arr.shape[1])]


def _untile(comps):
    return np.stack([np.asarray(c)[0] for c in comps], axis=1)


def test_reprojection_normalized_comp_matches():
    rng = np.random.default_rng(0)
    n = 64
    x = rng.standard_normal((n, 9)) * 0.5
    x[:, 8] += 4.0  # keep depth positive-ish
    ft = reprojection.reprojection_normalized()
    h_ref = np.stack([np.asarray(ft.meas(jnp.asarray(xi), None)) for xi in x])
    j_ref = np.stack([np.asarray(ft.jac(jnp.asarray(xi), None)) for xi in x])

    h, jac = reprojection_normalized_comp(_tiles(jnp.asarray(x)), None)
    np.testing.assert_allclose(_untile(h), h_ref, rtol=1e-6, atol=1e-8)
    j_flat = [jac[i][j] for i in range(2) for j in range(9)]
    np.testing.assert_allclose(
        _untile(j_flat), j_ref.reshape(n, 18), rtol=1e-5, atol=1e-7
    )


def test_bal_reprojection_normalized_comp_matches():
    rng = np.random.default_rng(1)
    n = 64
    x = rng.standard_normal((n, 9)) * 0.5
    x[:, 8] += 4.0
    k12 = rng.standard_normal((n, 2)) * 0.05
    ft = reprojection.bal_reprojection_normalized()
    h_ref = np.stack(
        [np.asarray(ft.meas(jnp.asarray(xi), jnp.asarray(a))) for xi, a in zip(x, k12)]
    )
    j_ref = np.stack(
        [np.asarray(ft.jac(jnp.asarray(xi), jnp.asarray(a))) for xi, a in zip(x, k12)]
    )

    h, jac = bal_reprojection_normalized_comp(
        _tiles(jnp.asarray(x)), _tiles(jnp.asarray(k12))
    )
    np.testing.assert_allclose(_untile(h), h_ref, rtol=1e-6, atol=1e-8)
    j_flat = [jac[i][j] for i in range(2) for j in range(9)]
    np.testing.assert_allclose(
        _untile(j_flat), j_ref.reshape(n, 18), rtol=1e-5, atol=1e-6
    )
