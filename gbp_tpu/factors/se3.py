"""SE(3) pose-graph factors (3D odometry / loop closure).

Covers 3D pose-graph SLAM (g2o sphere2500-style datasets) with the same engine
as BA and 2D SLAM.  The reference repo ships no pose-graph factors; this
realizes the north-star spec (SURVEY.md §2 planned components).

State: each pose is [t (3), omega (3)] — the world pose of frame i as a
translation + angle-axis rotation R_wi = exp(omega), updated additively (the
same flat-coordinates-through-exp convention the BA camera uses, SURVEY.md C7).

Measurement: relative pose of frame j in frame i:
    h = [R_i^T (t_j - t_i),  log(R_i^T R_j)]
The residual's rotation block is computed on the manifold,
r_w = log(R(h_w)^T R(z_w)), so it vanishes exactly at h == z and never wraps.
"""
from __future__ import annotations

import jax.numpy as jnp

from gbp_tpu.factors.base import FactorType
from gbp_tpu.utils.lie import so3_exp, so3_log
from gbp_tpu.utils.smalllinalg import bT, bmm, bmv


def se3_between() -> FactorType:
    """h([p_i, p_j]) = relative pose (t_ij, omega_ij) of j in frame i; zdim=6."""

    def meas(x, args):
        del args
        ti, wi = x[:3], x[3:6]
        tj, wj = x[6:9], x[9:12]
        ri = so3_exp(wi)
        rj = so3_exp(wj)
        rij = bmm(bT(ri), rj)
        tij = bmv(bT(ri), tj - ti)
        return jnp.concatenate([tij, so3_log(rij)])

    def residual(z, z_hat):
        rt = z[..., :3] - z_hat[..., :3]
        rz = so3_exp(z[..., 3:])
        rh = so3_exp(z_hat[..., 3:])
        rw = so3_log(bmm(bT(rh), rz))
        return jnp.concatenate([rt, rw], axis=-1)

    return FactorType(name="se3_between", zdim=6, meas_fn=meas, residual_fn=residual)


def se3_prior() -> FactorType:
    """Unary SE(3) anchor factor h(p) = p with manifold rotation residual."""

    def meas(x, args):
        del args
        return x

    def residual(z, z_hat):
        rt = z[..., :3] - z_hat[..., :3]
        rz = so3_exp(z[..., 3:])
        rh = so3_exp(z_hat[..., 3:])
        rw = so3_log(bmm(bT(rh), rz))
        return jnp.concatenate([rt, rw], axis=-1)

    return FactorType(name="se3_prior", zdim=6, meas_fn=meas, residual_fn=residual)
