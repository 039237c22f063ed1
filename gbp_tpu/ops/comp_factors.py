"""Component-form measurement models for fully-fused Pallas sweeps.

To fuse per-factor relinearization into the message kernel
(ops/messages_pallas.py) the measurement function h(x) and its analytic
Jacobian must be expressible in the kernel's component-major layout: state x
as a list of (sublane, lane) factor tiles, outputs as component lists.  This
module provides those forms for the hot factor types, mirroring the
row-major implementations in gbp_tpu/factors/ (reprojection.py; unit-tested
for equality against them).

Registry: COMP_FACTORS[ftype.name] -> fn(x_comps, args_comps) returning
(h [z], jac [z][t]) with all entries tiles.  Factor types not present here
fall back to the unfused XLA relinearization path.
"""
from __future__ import annotations

import jax.numpy as jnp

from gbp_tpu.ops import comp_linalg as cl
from gbp_tpu.utils.lie import stable_acos, wrap_angle


def _hat(w):
    """Component hat operator: [3] -> [3][3]."""
    zero = jnp.zeros_like(w[0])
    return [
        [zero, -w[2], w[1]],
        [w[2], zero, -w[0]],
        [-w[1], w[0], zero],
    ]


def _theta_coeffs(t2):
    """(sinc, cosc, cc) as in utils/lie.py, elementwise on tiles."""
    small = t2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(safe_t2)
    sinc = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    cc = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (1.0 - sinc) / safe_t2)
    return sinc, cosc, cc


def _so3_exp(w):
    """Rodrigues in component form: [3] -> R [3][3]."""
    t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    sinc, cosc, _ = _theta_coeffs(t2)
    k = _hat(w)
    kk = cl.cmm(k, k)
    one = jnp.ones_like(w[0])
    r = [[k[i][j] * sinc + kk[i][j] * cosc for j in range(3)] for i in range(3)]
    for i in range(3):
        r[i][i] = r[i][i] + one
    return r


def _right_jacobian(w):
    """SO(3) right Jacobian Jr(w) = I - c1 [w]x + c2 [w]x^2 (component form,
    coefficients as in factors/reprojection.py _right_jacobian_so3)."""
    t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    small = t2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(safe_t2)
    safe_t3 = safe_t2 * theta
    c1 = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    c2 = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (theta - jnp.sin(theta)) / safe_t3)
    k = _hat(w)
    kk = cl.cmm(k, k)
    one = jnp.ones_like(w[0])
    jr = [[-c1 * k[i][j] + c2 * kk[i][j] for j in range(3)] for i in range(3)]
    for i in range(3):
        jr[i][i] = jr[i][i] + one
    return jr


def _safe_z(zc):
    """Sign-preserving depth floor (|z| >= 1e-2) — mirrors
    factors/reprojection._safe_z so the fused kernels and the XLA path
    compute identical measurements: a linpoint crossing the z = 0 plane
    (degenerate arrival inits in the online stream) yields a finite
    Huber-rejectable residual instead of a NaN that poisons the sweep."""
    return jnp.where(zc >= 0, jnp.maximum(zc, 1e-2), jnp.minimum(zc, -1e-2))


def _cam_point(x):
    """x = [omega (3), t (3), X (3)] -> (R, Xc = R X + t, X)."""
    w = x[0:3]
    t = x[3:6]
    pt = x[6:9]
    r = _so3_exp(w)
    xc = [cl.cmv(r, pt)[i] + t[i] for i in range(3)]
    return r, xc, pt, w


def reprojection_normalized_comp(x, args):
    """Component form of factors/reprojection.reprojection_normalized."""
    del args
    r, xc, pt, w = _cam_point(x)
    inv_z = 1.0 / _safe_z(xc[2])
    h = [xc[0] * inv_z, xc[1] * inv_z]
    # dpi [2][3]
    zero = jnp.zeros_like(inv_z)
    dpi = [
        [inv_z, zero, -xc[0] * inv_z * inv_z],
        [zero, inv_z, -xc[1] * inv_z * inv_z],
    ]
    jr = _right_jacobian(w)
    d_omega = cl.cscale(cl.cmm(cl.cmm(r, _hat(pt)), jr), -1.0)  # [3][3]
    one = jnp.ones_like(inv_z)
    eye = [[one if i == j else zero for j in range(3)] for i in range(3)]
    dxc = [d_omega[i] + eye[i] + r[i] for i in range(3)]  # [3][9] rows concat
    jac = cl.cmm(dpi, dxc)  # [2][9]
    return h, jac


def bal_reprojection_normalized_comp(x, args):
    """Component form of factors/reprojection.bal_reprojection_normalized.

    args = [k1, k2] tiles; h = (1 + k1 r^2 + k2 r^4) * p, p = -Xc.xy / Xc.z.
    The Jacobian is assembled analytically through the distortion chain rule.
    """
    k1, k2 = args[0], args[1]
    r, xc, pt, w = _cam_point(x)
    inv_z = 1.0 / _safe_z(xc[2])
    p = [-xc[0] * inv_z, -xc[1] * inv_z]
    r2 = p[0] * p[0] + p[1] * p[1]
    dist = 1.0 + r2 * (k1 + k2 * r2)
    h = [dist * p[0], dist * p[1]]

    # dp/dXc [2][3] (p = -Xc.xy / Xc.z).
    zero = jnp.zeros_like(inv_z)
    dp = [
        [-inv_z, zero, xc[0] * inv_z * inv_z],
        [zero, -inv_z, xc[1] * inv_z * inv_z],
    ]
    # dh/dp = dist * I + p * (d dist/d r2) * d r2/dp;  d dist/d r2 = k1 + 2 k2 r2.
    ddist = k1 + 2.0 * k2 * r2
    dh_dp = [
        [dist + p[0] * ddist * 2.0 * p[0], p[0] * ddist * 2.0 * p[1]],
        [p[1] * ddist * 2.0 * p[0], dist + p[1] * ddist * 2.0 * p[1]],
    ]
    dh_dxc = cl.cmm(dh_dp, dp)  # [2][3]
    jr = _right_jacobian(w)
    d_omega = cl.cscale(cl.cmm(cl.cmm(r, _hat(pt)), jr), -1.0)
    one = jnp.ones_like(inv_z)
    eye = [[one if i == j else zero for j in range(3)] for i in range(3)]
    dxc = [d_omega[i] + eye[i] + r[i] for i in range(3)]
    jac = cl.cmm(dh_dxc, dxc)
    return h, jac


def bal_reprojection_intrinsics_comp(x, args):
    """Component form of factors/reprojection.bal_reprojection_intrinsics.

    x = [omega (3), t (3), rf, k1, k2, X (3)] (12 components); the camera
    slot is 9-dof (pose + relative focal + distortion), so the Jacobian is
    [2][12] with intrinsics columns at 6..8."""
    del args
    w = x[0:3]
    t = x[3:6]
    rf, k1, k2 = x[6], x[7], x[8]
    pt = x[9:12]
    r = _so3_exp(w)
    xc = [cl.cmv(r, pt)[i] + t[i] for i in range(3)]
    inv_z = 1.0 / _safe_z(xc[2])
    p = [-xc[0] * inv_z, -xc[1] * inv_z]
    r2 = p[0] * p[0] + p[1] * p[1]
    dist = 1.0 + r2 * (k1 + k2 * r2)
    h = [rf * dist * p[0], rf * dist * p[1]]

    # dh/dXc = rf * (dist I + p ddist 2 p^T) . dp/dXc  (as in the fixed-K
    # BAL form, scaled by rf).
    zero = jnp.zeros_like(inv_z)
    dp = [
        [-inv_z, zero, xc[0] * inv_z * inv_z],
        [zero, -inv_z, xc[1] * inv_z * inv_z],
    ]
    ddist = k1 + 2.0 * k2 * r2
    dh_dp = [
        [rf * (dist + p[0] * ddist * 2.0 * p[0]), rf * (p[0] * ddist * 2.0 * p[1])],
        [rf * (p[1] * ddist * 2.0 * p[0]), rf * (dist + p[1] * ddist * 2.0 * p[1])],
    ]
    dh_dxc = cl.cmm(dh_dp, dp)  # [2][3]
    jr = _right_jacobian(w)
    d_omega = cl.cscale(cl.cmm(cl.cmm(r, _hat(pt)), jr), -1.0)
    one = jnp.ones_like(inv_z)
    eye = [[one if i == j else zero for j in range(3)] for i in range(3)]
    dxc = [d_omega[i] + eye[i] + r[i] for i in range(3)]  # rows: [3][9]
    d_pose_pt = cl.cmm(dh_dxc, dxc)  # [2][9] -> cols [omega, t, X]
    r4 = r2 * r2
    jac = [
        d_pose_pt[i][0:6]
        + [dist * p[i], rf * r2 * p[i], rf * r4 * p[i]]
        + d_pose_pt[i][6:9]
        for i in range(2)
    ]
    return h, jac


def _so3_log(r):
    """Component so3_log mirroring utils/lie.so3_log numerics:
    [3][3] component matrix -> [3] axis-angle components."""
    trace = r[0][0] + r[1][1] + r[2][2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    # stable_acos, not jnp.arccos: acos has no Mosaic lowering, and this
    # runs inside the fused relinearization kernel.  Same function as
    # utils/lie.so3_log -> the CM<->generic f64 parity stays exact.
    theta = stable_acos(cos_theta)
    vee = [r[2][1] - r[1][2], r[0][2] - r[2][0], r[1][0] - r[0][1]]
    small = jnp.abs(theta) < 1e-4
    scale = jnp.where(
        small, 0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.where(small, 1.0, jnp.sin(theta))))
    return [scale * v for v in vee]


def _right_jacobian_inv(w):
    """Jr(w)^-1 = I + [w]x/2 + c [w]x^2 with c = 1/t2 - cot(t/2)/(2t)
    (the (1+cos)/(2 t sin) form rewritten via cot(t/2) so it is finite at
    t = pi); series 1/12 + t2/720 for small angles."""
    t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    small = t2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(safe_t2)
    c = jnp.where(
        small, 1.0 / 12.0 + t2 / 720.0,
        1.0 / safe_t2 - 1.0 / (2.0 * theta * jnp.tan(theta / 2.0)))
    k = _hat(w)
    kk = cl.cmm(k, k)
    one = jnp.ones_like(w[0])
    j = [[0.5 * k[i][jj] + c * kk[i][jj] for jj in range(3)]
         for i in range(3)]
    for i in range(3):
        j[i][i] = j[i][i] + one
    return j


def se3_between_comp(x, args):
    """Component form of factors/se3.se3_between.

    x = [t_i (3), w_i (3), t_j (3), w_j (3)]; h = [R_i^T (t_j - t_i),
    log(R_i^T R_j)]; analytic [6][12] Jacobian in the flat
    additive-update convention (exp(w + dw) = exp(w) exp(Jr(w) dw)):

        dh_t/dt_i = -R_i^T          dh_t/dt_j = R_i^T
        dh_t/dw_i = [h_t]x Jr(w_i)  dh_t/dw_j = 0
        dh_w/dw_i = -Jl^-1(h_w) Jr(w_i) = -(Jr^-1(h_w))^T Jr(w_i)
        dh_w/dw_j =  Jr^-1(h_w) Jr(w_j)
    """
    del args
    ti, wi = x[0:3], x[3:6]
    tj, wj = x[6:9], x[9:12]
    rit = cl.ct(_so3_exp(wi))
    rj = _so3_exp(wj)
    d = [tj[k] - ti[k] for k in range(3)]
    ht = cl.cmv(rit, d)
    hw = _so3_log(cl.cmm(rit, rj))
    jr_i = _right_jacobian(wi)
    jr_j = _right_jacobian(wj)
    jinv = _right_jacobian_inv(hw)
    dt_dwi = cl.cmm(_hat(ht), jr_i)
    dw_dwi = cl.cscale(cl.cmm(cl.ct(jinv), jr_i), -1.0)
    dw_dwj = cl.cmm(jinv, jr_j)
    zero = jnp.zeros_like(ht[0])
    jac = []
    for k in range(3):
        jac.append([-rit[k][0], -rit[k][1], -rit[k][2],
                    dt_dwi[k][0], dt_dwi[k][1], dt_dwi[k][2],
                    rit[k][0], rit[k][1], rit[k][2],
                    zero, zero, zero])
    for k in range(3):
        jac.append([zero, zero, zero,
                    dw_dwi[k][0], dw_dwi[k][1], dw_dwi[k][2],
                    zero, zero, zero,
                    dw_dwj[k][0], dw_dwj[k][1], dw_dwj[k][2]])
    return ht + hw, jac


def se3_between_res(z, h):
    """Component residual of se3_between: translation additive, rotation on
    the manifold r_w = log(R(h_w)^T R(z_w)) (factors/se3.py residual)."""
    rt = [z[k] - h[k] for k in range(3)]
    rh = _so3_exp(h[3:6])
    rz = _so3_exp(z[3:6])
    rw = _so3_log(cl.cmm(cl.ct(rh), rz))
    return rt + rw


def se2_between_comp(x, args):
    """Component form of factors/odometry.se2_between.

    x = [xi, yi, ti, xj, yj, tj]; h = relative pose of j in frame i
    (utils/lie.se2_relative convention); jac [3][6] analytic."""
    del args
    c, s = jnp.cos(x[2]), jnp.sin(x[2])
    dx = x[3] - x[0]
    dy = x[4] - x[1]
    h0 = c * dx + s * dy
    h1 = -s * dx + c * dy
    h = [h0, h1, x[5] - x[2]]
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    jac = [
        [-c, -s, h1, c, s, zero],
        [s, -c, -h0, -s, c, zero],
        [zero, zero, -one, zero, zero, one],
    ]
    return h, jac


def se2_between_res(z, h):
    """Component residual of se2_between: angle component wrapped to
    [-pi, pi) (factors/odometry.se2_between residual — the SAME
    utils/lie.wrap_angle, which is floor-form because atan2 has no Mosaic
    lowering and this runs inside the fused kernel)."""
    return [z[0] - h[0], z[1] - h[1], wrap_angle(z[2] - h[2])]


# ftype.name -> (comp fn, n_arg_components[, residual comp fn]).
# The optional residual fn(z_comps, h_comps) -> r_comps replaces the default
# r = z - h inside the fused relinearization kernel (angle wrap / manifold
# log residuals — factor types whose FactorType.residual_fn is not None).
COMP_FACTORS = {
    "reprojection_normalized": (reprojection_normalized_comp, 0),
    "bal_reprojection_normalized": (bal_reprojection_normalized_comp, 2),
    "bal_reprojection_intrinsics": (bal_reprojection_intrinsics_comp, 0),
    "se2_between": (se2_between_comp, 0, se2_between_res),
    "se3_between": (se3_between_comp, 0, se3_between_res),
}
