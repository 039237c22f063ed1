"""SO(3)/SE(3)/SE(2) Lie-group helpers in JAX.

Equivalent surface to the reference's `utils/lie_algebra.py` (joeaortiz/gbp;
SURVEY.md C10): hat operators, so3 exp/log, SE(3) exp/log, point transforms.
All functions are pure, batched over leading dims, and safe at the identity
(Taylor guards around theta ~ 0 so jacfwd/jacrev stay finite).
"""
from __future__ import annotations

import jax.numpy as jnp

from gbp_tpu.utils.smalllinalg import bmm, bmv

_EPS = 1e-8


def hat3(w):
    """so(3) hat: [..., 3] -> [..., 3, 3] skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def _theta_coeffs(t2):
    """(sinc, cosc, cc) = (sin t/t, (1-cos t)/t^2, (1 - sinc)/t^2) from t2 = theta^2.

    Structured so gradients are finite at theta = 0: the sqrt is guarded and the
    Taylor branch (a polynomial in t2) carries the gradient there.
    """
    small = t2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(safe_t2)
    sinc = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    cc = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (1.0 - sinc) / safe_t2)
    return sinc, cosc, cc


def so3_exp(w):
    """Rodrigues: axis-angle [..., 3] -> rotation matrix [..., 3, 3]."""
    t2 = jnp.sum(w * w, axis=-1)
    sinc, cosc, _ = _theta_coeffs(t2)
    k = hat3(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + sinc[..., None, None] * k + cosc[..., None, None] * bmm(k, k)


def so3_log(r):
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3]."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    vee = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    # vee = 2 sin(theta) * axis; w = theta * axis.
    scale = jnp.where(
        jnp.abs(theta) < 1e-4,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.where(jnp.abs(theta) < 1e-4, 1.0, jnp.sin(theta))),
    )
    return scale[..., None] * vee


def _left_jacobian(w):
    """V(w) = I + cosc [w]x + cc [w]x^2 (the SO(3) left Jacobian)."""
    t2 = jnp.sum(w * w, axis=-1)
    _, cosc, cc = _theta_coeffs(t2)
    k = hat3(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + cosc[..., None, None] * k + cc[..., None, None] * bmm(k, k)


def se3_exp(xi):
    """se(3) twist [..., 6] (rho, omega) -> (R [..., 3, 3], t [..., 3])."""
    rho, w = xi[..., :3], xi[..., 3:]
    r = so3_exp(w)
    t = bmv(_left_jacobian(w), rho)
    return r, t


def se3_log(r, t):
    """(R, t) -> twist [..., 6] (rho, omega)."""
    w = so3_log(r)
    v_inv = jnp.linalg.inv(_left_jacobian(w))
    rho = bmv(v_inv, t)
    return jnp.concatenate([rho, w], axis=-1)


def transform_point(w_t, x):
    """Apply pose [..., 6] = (omega, trans) to world point [..., 3]:  R x + t.

    Convention (matches the BA camera state of SURVEY.md C7): the 6-vector is
    [omega (angle-axis, 3), translation (3)], mapping world -> camera frame.
    """
    r = so3_exp(w_t[..., :3])
    return bmv(r, x) + w_t[..., 3:]


# --- SE(2) -----------------------------------------------------------------


def se2_compose(a, b):
    """Compose SE(2) poses [..., 3] = (x, y, theta): a then b (a * b)."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    th = a[..., 2] + b[..., 2]
    return jnp.stack([x, y, th], axis=-1)


def se2_relative(a, b):
    """Relative pose a^-1 * b for SE(2) poses [..., 3] (x, y, theta)."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    dx = b[..., 0] - a[..., 0]
    dy = b[..., 1] - a[..., 1]
    x = ca * dx + sa * dy
    y = -sa * dx + ca * dy
    th = b[..., 2] - a[..., 2]
    return jnp.stack([x, y, th], axis=-1)


def wrap_angle(theta):
    """Wrap to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))
