"""Pinhole reprojection factors for bundle adjustment.

Reference parity: joeaortiz/gbp `gbp/factors/reprojection.py` (SURVEY.md C7).
State layout x = [camera (6), landmark (3)] where the camera is a minimal
world->camera parameterization [omega (angle-axis, 3), translation (3)] updated
additively (exactly the reference's convention: flat R^6 coords, meas_fn maps
through the exp map).  h(x) = project(K, R(omega) X + t).

Two variants:
  * `reprojection()` — shared pinhole intrinsics K = [fx, fy, cx, cy] passed as
    per-factor args (the reference's TUM-style data).
  * `bal_reprojection()` — standard BAL convention with per-camera
    (f, k1, k2) radial distortion and the BAL z-negation.

The analytic Jacobian uses the compact right-Jacobian formula
d(R(w)p)/dw = -R [p]x Jr(w); it is unit-tested against jax.jacfwd.
"""
from __future__ import annotations

import jax.numpy as jnp

from gbp_tpu.factors.base import FactorType
from gbp_tpu.utils.lie import hat3, so3_exp
from gbp_tpu.utils.smalllinalg import bmm, bmv

_CAM_DOF = 6


def _right_jacobian_so3(w):
    """Right Jacobian of SO(3): Jr(w) = I - c1 [w]x + c2 [w]x^2."""
    theta = jnp.linalg.norm(w, axis=-1)
    t2 = theta * theta
    small = jnp.abs(theta) < 1e-4
    safe_t2 = jnp.where(small, 1.0, t2)
    safe_t3 = jnp.where(small, 1.0, t2 * theta)
    c1 = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    c2 = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (theta - jnp.sin(theta)) / safe_t3)
    k = hat3(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - c1[..., None, None] * k + c2[..., None, None] * bmm(k, k)


def _cam_point(x):
    """Split x = [omega, t, X]; return (R, Xc = R X + t, X)."""
    w, t, pt = x[:3], x[3:6], x[6:9]
    r = so3_exp(w)
    xc = bmv(r, pt) + t
    return r, xc, pt


def _safe_z(z, eps=1e-2):
    """Sign-preserving depth floor: |z| >= eps, so a landmark crossing the
    camera's z = 0 plane mid-iteration produces a huge-but-FINITE residual
    (which Huber then rejects) instead of a 1/z overflow whose NaN poisons
    every belief it touches.  Linpoints only cross the plane in degenerate
    transients — e.g. a streamed frame arriving with a bad absolute init
    (online serving measured 182 behind-camera observations on one corridor
    frame: the un-guarded factor NaN'd the whole window).  Outside |z| < eps
    this is the identity, so Jacobian-vs-autodiff parity at healthy points
    is untouched.  Works for both depth conventions (pinhole z > 0 in
    front, BAL z < 0)."""
    return jnp.where(z >= 0, jnp.maximum(z, eps), jnp.minimum(z, -eps))


def reprojection() -> FactorType:
    """Pinhole reprojection; args = K as [fx, fy, cx, cy]."""

    def meas(x, k):
        _, xc, _ = _cam_point(x)
        inv_z = 1.0 / _safe_z(xc[2])
        return jnp.stack([k[0] * xc[0] * inv_z + k[2], k[1] * xc[1] * inv_z + k[3]])

    def jac(x, k):
        r, xc, pt = _cam_point(x)
        fx, fy = k[0], k[1]
        inv_z = 1.0 / _safe_z(xc[2])
        zero = jnp.zeros_like(inv_z)
        # d(pixel)/d(Xc): [2, 3].  Built with stack, NOT .at[].set(): under
        # vmap XLA materializes the scatter with tile-padded layouts (~60x
        # memory blowup at millions of factors).
        dpi = jnp.stack([
            jnp.stack([fx * inv_z, zero, -fx * xc[0] * inv_z * inv_z]),
            jnp.stack([zero, fy * inv_z, -fy * xc[1] * inv_z * inv_z]),
        ])
        # d(Xc)/d(omega) = -R [pt]x Jr(omega);  d(Xc)/dt = I;  d(Xc)/dX = R.
        jr = _right_jacobian_so3(x[:3])
        d_omega = -bmm(bmm(r, hat3(pt)), jr)
        dxc = jnp.concatenate([d_omega, jnp.eye(3, dtype=x.dtype), r], axis=-1)  # [3, 9]
        return bmm(dpi, dxc)

    return FactorType(name="reprojection", zdim=2, meas_fn=meas, jac_fn=jac)


def reprojection_normalized() -> FactorType:
    """Pinhole reprojection in NORMALIZED image coordinates; args = None.

    h(x) = [Xc.x/Xc.z, Xc.y/Xc.z] with measurements pre-normalized as
    z = (pixel - principal_point) / focal and sigma = pix_sigma / focal.

    Identical Mahalanobis geometry to `reprojection()` (same posterior), but
    Jacobian entries are O(1/depth) instead of O(focal/depth): the factor
    precision J^T Lam J spans ~focal^2 less dynamic range, which is the
    difference between f32 message Schur complements being garbage (indefinite
    beliefs, NaNs on sweep 1) and accurate to ~1e-5.  This is the f32/TPU
    answer to SURVEY.md §7 'Precision'.
    """

    def meas(x, args):
        del args
        _, xc, _ = _cam_point(x)
        return xc[:2] / _safe_z(xc[2])

    def jac(x, args):
        del args
        r, xc, pt = _cam_point(x)
        inv_z = 1.0 / _safe_z(xc[2])
        zero = jnp.zeros_like(inv_z)
        # Stack-built (no .at[].set(): vmapped scatters get tile-padded
        # layouts from XLA — a ~60x memory blowup at millions of factors).
        dpi = jnp.stack([
            jnp.stack([inv_z, zero, -xc[0] * inv_z * inv_z]),
            jnp.stack([zero, inv_z, -xc[1] * inv_z * inv_z]),
        ])
        jr = _right_jacobian_so3(x[:3])
        d_omega = -bmm(bmm(r, hat3(pt)), jr)
        dxc = jnp.concatenate([d_omega, jnp.eye(3, dtype=x.dtype), r], axis=-1)
        return bmm(dpi, dxc)

    return FactorType(name="reprojection_normalized", zdim=2, meas_fn=meas, jac_fn=jac)


def bal_reprojection() -> FactorType:
    """Standard BAL measurement model; args = [f, k1, k2] per camera.

    P = R X + t;  p = -P / P.z;  pixel = f * (1 + k1 r^2 + k2 r^4) * p.
    """

    def meas(x, cam):
        _, xc, _ = _cam_point(x)
        p = -xc[:2] / _safe_z(xc[2])
        r2 = p[0] * p[0] + p[1] * p[1]
        distortion = 1.0 + r2 * (cam[1] + cam[2] * r2)
        return cam[0] * distortion * p

    return FactorType(name="bal_reprojection", zdim=2, meas_fn=meas)


def bal_reprojection_normalized() -> FactorType:
    """BAL measurement model in NORMALIZED coordinates; args = [k1, k2].

    h(x) = (1 + k1 r^2 + k2 r^4) * p with p = -Xc.xy / Xc.z; measurements are
    pre-divided by the per-camera focal (z = pixel / f, sigma = pix_sigma / f).
    Same posterior as `bal_reprojection` but with O(1) Jacobian entries —
    the f32/TPU conditioning fix (see `reprojection_normalized`)."""

    def meas(x, dist):
        _, xc, _ = _cam_point(x)
        p = -xc[:2] / _safe_z(xc[2])
        r2 = p[0] * p[0] + p[1] * p[1]
        distortion = 1.0 + r2 * (dist[0] + dist[1] * r2)
        return distortion * p

    return FactorType(name="bal_reprojection_normalized", zdim=2, meas_fn=meas)


def bal_reprojection_intrinsics() -> FactorType:
    """BAL model with the PER-CAMERA INTRINSICS IN THE STATE; args = None.

    The camera is the standard 9-parameter BAL camera that Ceres-style
    solvers optimize — beyond the reference, whose intrinsics are fixed
    per-factor constants (gbp/factors/reprojection.py, SURVEY.md C7).
    State x = [omega (3), t (3), rf, k1, k2 | X (3)] where rf = f / f0 is
    the focal RELATIVE to the file's initial estimate f0, so every state
    component is O(1) (the f32 conditioning requirement — see
    `reprojection_normalized`).  Measurements are pre-divided by f0
    (z = pixel / f0, sigma = pix_sigma / f0):

        h(x) = rf * (1 + k1 r^2 + k2 r^4) * p,   p = -Xc.xy / Xc.z.
    """

    def meas(x, args):
        del args
        w, t, pt = x[:3], x[3:6], x[9:12]
        rf, k1, k2 = x[6], x[7], x[8]
        xc = bmv(so3_exp(w), pt) + t
        p = -xc[:2] / _safe_z(xc[2])
        r2 = p[0] * p[0] + p[1] * p[1]
        distortion = 1.0 + r2 * (k1 + k2 * r2)
        return rf * distortion * p

    return FactorType(name="bal_reprojection_intrinsics", zdim=2, meas_fn=meas)


CAM_DOF = _CAM_DOF
LMK_DOF = 3
CAM_INTR_DOF = 9  # [omega, t, rf, k1, k2] for bal_reprojection_intrinsics
