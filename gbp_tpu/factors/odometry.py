"""SE(2) pose-graph factors (odometry + loop closure).

Covers BASELINE.json configs[1]: 2D synthetic pose-graph SLAM with Manhattan-
style odometry and loop-closure factors, Huber-robustified.  The reference repo
itself only ships linear + reprojection factors; pose-graph support is part of
the north-star spec (SURVEY.md §2 table, BASELINE.json north_star).

State: each pose variable is [x, y, theta] (3-dof).  The measurement is the
relative pose T_i^-1 * T_j expressed in frame i; the residual wraps the angle
component to (-pi, pi].
"""
from __future__ import annotations

import jax.numpy as jnp

from gbp_tpu.factors.base import FactorType
from gbp_tpu.utils.lie import se2_relative, wrap_angle


def se2_between() -> FactorType:
    """h([p_i, p_j]) = p_i^-1 * p_j (relative SE(2) pose), zdim = 3."""

    def meas(x, args):
        del args
        return se2_relative(x[:3], x[3:])

    def residual(z, z_hat):
        r = z - z_hat
        return r.at[..., 2].set(wrap_angle(r[..., 2]))

    return FactorType(name="se2_between", zdim=3, meas_fn=meas, residual_fn=residual)


def se2_prior() -> FactorType:
    """Unary SE(2) anchor factor h(p) = p with wrapped angle residual."""

    def meas(x, args):
        del args
        return x

    def residual(z, z_hat):
        r = z - z_hat
        return r.at[..., 2].set(wrap_angle(r[..., 2]))

    return FactorType(name="se2_prior", zdim=3, meas_fn=meas, residual_fn=residual, linear=True)
