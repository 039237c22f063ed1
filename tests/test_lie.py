import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.utils.lie import (
    hat3,
    se2_compose,
    se2_relative,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    wrap_angle,
)


def test_so3_exp_orthonormal():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((32, 3)))
    r = so3_exp(w)
    eye = np.broadcast_to(np.eye(3), r.shape)
    np.testing.assert_allclose(np.asarray(r @ jnp.swapaxes(r, -1, -2)), eye, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(r)), 1.0, atol=1e-12)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, 3.0, (64, 1))
    back = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
    np.testing.assert_allclose(back, w, atol=1e-8)


def test_so3_exp_near_identity_grad_finite():
    g = jax.jacfwd(lambda w: so3_exp(w).reshape(-1))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    xi = rng.standard_normal((32, 6)) * 0.8
    r, t = se3_exp(jnp.asarray(xi))
    back = np.asarray(se3_log(r, t))
    np.testing.assert_allclose(back, xi, atol=1e-8)


def test_hat3_antisymmetric():
    w = jnp.asarray([[1.0, 2.0, 3.0]])
    h = hat3(w)
    np.testing.assert_allclose(np.asarray(h + jnp.swapaxes(h, -1, -2)), 0.0)


def test_se2_compose_relative_roundtrip():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((16, 3)))
    b = jnp.asarray(rng.standard_normal((16, 3)))
    rel = se2_relative(a, b)
    b2 = se2_compose(a, rel)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b), atol=1e-12)


def test_wrap_angle():
    rng = np.random.default_rng(0)
    theta = rng.uniform(-10, 10, 64)
    w = np.asarray(wrap_angle(jnp.asarray(theta)))
    assert (np.abs(w) <= np.pi + 1e-12).all()
    # Same angle modulo 2*pi.
    np.testing.assert_allclose(np.cos(w), np.cos(theta), atol=1e-12)
    np.testing.assert_allclose(np.sin(w), np.sin(theta), atol=1e-12)
