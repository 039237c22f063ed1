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
    theta = stable_acos(cos_theta)
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
    """Wrap to [-pi, pi).

    Floor form rather than arctan2(sin, cos): atan2 has no Pallas/Mosaic
    TPU lowering, and this function is the angle residual inside the fused
    relinearization kernel (ops/comp_factors.se2_between_res) as well as in
    the generic engine (factors/odometry.py) — one formula in both keeps
    the CM<->generic parity tests exact."""
    two_pi = 2.0 * jnp.pi
    return theta - two_pi * jnp.floor((theta + jnp.pi) / two_pi)


def stable_acos(c):
    """arccos(clip(c, -1, 1)) from Mosaic-lowerable primitives only.

    acos/asin/atan2 have no Pallas TPU lowering; sin/cos/sqrt/floor do.
    Invert cos by 3 Newton steps seeded with an asin/acos series, switching
    between solving sin(t) = sqrt(1-c^2) (|c| >= sqrt(1/2), where cos(t) is
    a safe Newton denominator) and cos(t) = |c| (where sin(t) is), so the
    derivative magnitude is always >= 0.707.  Accurate to a few ulp in f64
    (pinned by tests/test_lie.py); used by so3_log here and by the
    component-form so3_log inside the fused kernels (ops/comp_factors.py)."""
    a = jnp.abs(jnp.clip(c, -1.0, 1.0))
    s = jnp.sqrt(jnp.maximum((1.0 - a) * (1.0 + a), 0.0))

    def asin_series(t):  # |t| <= sqrt(1/2); error < 1.4e-3, Newton cleans up
        t2 = t * t
        return t * (1.0 + t2 * (1.0 / 6.0 + t2 * (3.0 / 40.0
                                                  + t2 * (15.0 / 336.0))))

    near1 = a >= 0.7071067811865476
    th = jnp.where(near1, asin_series(s), 0.5 * jnp.pi - asin_series(a))
    for _ in range(3):
        sin_t, cos_t = jnp.sin(th), jnp.cos(th)
        th = jnp.where(near1, th - (sin_t - s) / cos_t,
                       th + (cos_t - a) / sin_t)
    return jnp.where(c < 0, jnp.pi - th, th)
