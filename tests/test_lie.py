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


def test_stable_acos_matches_numpy():
    """stable_acos (Newton from Mosaic-lowerable primitives) vs np.arccos.

    It must be accurate everywhere in [-1, 1] including the endpoints and
    the region-switch point sqrt(1/2), and must clip out-of-range inputs
    the way so3_log's trace argument needs."""
    from gbp_tpu.utils.lie import stable_acos

    c = np.concatenate([
        np.linspace(-1.0, 1.0, 20001),
        [-1.0, 1.0, 0.0, 0.7071067811865476, -0.7071067811865476],
        1.0 - np.logspace(-16, -1, 40),       # near +1 (theta ~ 0)
        -1.0 + np.logspace(-16, -1, 40),      # near -1 (theta ~ pi)
    ])
    got = np.asarray(stable_acos(jnp.asarray(c, jnp.float64)))
    np.testing.assert_allclose(got, np.arccos(c), atol=4e-15)
    # out-of-range inputs clip instead of producing NaN
    assert float(stable_acos(jnp.asarray(1.0 + 1e-6))) == 0.0
    np.testing.assert_allclose(float(stable_acos(jnp.asarray(-1.0 - 1e-6))),
                               np.pi, rtol=0, atol=1e-15)
    # f32: a few-ulp bound at f32 scale, against arccos of the f32-rounded
    # input (inputs within one f32 ulp of +-1 collapse to the endpoint).
    c32 = c.astype(np.float32)
    got32 = np.asarray(stable_acos(jnp.asarray(c32)))
    np.testing.assert_allclose(got32, np.arccos(c32.astype(np.float64)),
                               atol=5e-7)
