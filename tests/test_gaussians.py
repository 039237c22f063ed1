import jax.numpy as jnp
import numpy as np

from gbp_tpu import gaussians
from gbp_tpu.gaussians import Gaussian, from_moments, isotropic, marginalize


def test_add_is_density_product():
    g1 = isotropic(jnp.asarray([1.0, 2.0]), 2.0)
    g2 = isotropic(jnp.asarray([3.0, 0.0]), 1.0)
    s = g1 + g2
    # Precision-weighted mean.
    expected = (2.0 * np.array([1, 2.0]) + 1.0 * np.array([3, 0.0])) / 3.0
    np.testing.assert_allclose(np.asarray(s.mean()), expected, atol=1e-12)


def test_from_moments_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 4, 4))
    sigma = a @ a.transpose(0, 2, 1) + 4 * np.eye(4)
    mu = rng.standard_normal((8, 4))
    g = from_moments(jnp.asarray(mu), jnp.asarray(sigma))
    np.testing.assert_allclose(np.asarray(g.mean()), mu, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g.cov()), sigma, rtol=1e-8, atol=1e-8)


def test_marginalize_matches_dense():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((5, 9, 9))
    lam = a @ a.transpose(0, 2, 1) + 9 * np.eye(9)
    eta = rng.standard_normal((5, 9))
    # Moments-domain check: marginal of a Gaussian = submatrix of cov / mean.
    cov = np.linalg.inv(lam)
    mu = np.linalg.solve(lam, eta[..., None])[..., 0]
    for start, dim in [(0, 6), (6, 3), (2, 4)]:
        g = marginalize(jnp.asarray(eta), jnp.asarray(lam), start, dim)
        sub_cov = cov[:, start : start + dim, start : start + dim]
        sub_mu = mu[:, start : start + dim]
        np.testing.assert_allclose(np.asarray(g.cov()), sub_cov, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(g.mean()), sub_mu, rtol=1e-8, atol=1e-10)


def test_zeros_and_sub():
    z = gaussians.zeros((3,), 2, dtype=jnp.float64)
    g = isotropic(jnp.ones((3, 2)), 5.0)
    diff = g - z
    np.testing.assert_allclose(np.asarray(diff.eta), np.asarray(g.eta))
