import jax.numpy as jnp
import numpy as np
import pytest

from gbp_tpu.utils.smalllinalg import sym_inv, sym_solve, symmetrize


def random_spd(rng, batch, d):
    a = rng.standard_normal((batch, d, d))
    return a @ a.transpose(0, 2, 1) + d * np.eye(d)


@pytest.mark.parametrize("d", [1, 2, 3, 4, 5, 6, 7, 9])
def test_sym_inv_matches_numpy(d):
    rng = np.random.default_rng(0)
    a = random_spd(rng, 64, d)
    inv = np.asarray(sym_inv(jnp.asarray(a)))
    np.testing.assert_allclose(inv, np.linalg.inv(a), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("d", [1, 3, 6, 9])
def test_sym_solve(d):
    rng = np.random.default_rng(1)
    a = random_spd(rng, 32, d)
    b = rng.standard_normal((32, d))
    x = np.asarray(sym_solve(jnp.asarray(a), jnp.asarray(b)))
    expected = np.linalg.solve(a, b[..., None])[..., 0]
    np.testing.assert_allclose(x, expected, rtol=1e-9, atol=1e-9)


def test_sym_inv_f32_conditioning():
    # f32 path stays accurate for BA-scale 9x9 blocks.
    rng = np.random.default_rng(2)
    a = random_spd(rng, 128, 9).astype(np.float32)
    inv = np.asarray(sym_inv(jnp.asarray(a, dtype=jnp.float32)))
    assert inv.dtype == np.float32
    err = np.abs(inv @ a - np.eye(9)).max()
    assert err < 1e-3


def test_symmetrize():
    a = jnp.arange(9.0).reshape(1, 3, 3)
    s = symmetrize(a)
    np.testing.assert_allclose(np.asarray(s), np.asarray(jnp.swapaxes(s, -1, -2)))
