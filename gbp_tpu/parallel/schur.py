"""Distributed camera-block Schur-complement solver for bundle adjustment.

North-star requirement [BASELINE.json: "a distributed Schur-complement
reduction path for camera-block elimination in large BA problems"].  The
reference repo's only direct solver is the dense joint oracle (SURVEY.md
§3.4), O(D^2) memory; this is the scalable equivalent:

    H = [[Hcc, Hcl], [Hlc, Hll]],  H d = b   (Gauss-Newton normal equations)
    landmarks eliminated:  S dc = r,   S = Hcc - Hcl Hll^-1 Hlc
    back-substitution:     dl = Hll^-1 (bl - Hlc dc)

S is never materialized: BA has no direct camera-camera factors, so Hcc is
block-diagonal and S·v is applied implicitly with two factor-indexed
reductions per product (gather v at cameras -> per-factor 3-vectors ->
segment-sum per landmark -> scale by the precomputed Hll^-1 -> per-factor
6-vectors -> segment-sum per camera).  The reduced system is solved by
block-Jacobi-preconditioned conjugate gradients.

Distribution falls out of the data placement: with factor arrays sharded
over a device mesh (gbp_tpu/parallel/sharding.py) the segment-sums become
per-chip partials + psum inserted by the SPMD partitioner — the
camera-block elimination reduces over ICI while each chip touches only its
own observations.

Everything is f64-capable and jit-compiled; one call = one Gauss-Newton
step (relinearize at the current means, solve, update means).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gbp_tpu.core.graph import Graph
from gbp_tpu.core.sweep import (
    GBPState,
    f32_exact,
    gather_linpoint,
    huber_weight,
    linearize_block,
)
from gbp_tpu.utils.smalllinalg import bT, bmm, bmv, scaled_sym_inv


def _prior_terms(vb, x0):
    """Quadratic prior in Delta coordinates around x0: (Lam_p, eta_p - Lam_p x0)."""
    return vb.prior_lam, vb.prior_eta - bmv(vb.prior_lam, x0)


@functools.partial(
    jax.jit,
    static_argnames=("fi", "cam_vi", "lmk_vi", "cg_iters", "lm_damping"),
)
@f32_exact
def gauss_newton_step(graph: Graph, means: tuple, fi: int = 0, cam_vi: int = 0,
                      lmk_vi: int = 1, cg_iters: int = 50, lm_damping: float = 0.0):
    """One Schur/CG Gauss-Newton step on a BA graph; returns new means tuple.

    graph: 2-slot reprojection block `fi` connecting (cam_vi, lmk_vi), with
    variable priors supplying the gauge (exactly models/ba.build's output).
    lm_damping: optional Levenberg-Marquardt diagonal damping on Hcc/Hll.
    """
    fb = graph.fblocks[fi]
    d_c = graph.vblocks[cam_vi].dof
    d_l = graph.vblocks[lmk_vi].dof
    n_c = graph.vblocks[cam_vi].count
    n_l = graph.vblocks[lmk_vi].count
    cam_ids, lmk_ids = fb.adj[0], fb.adj[1]

    # Linearize all factors at the current means.
    x = jnp.concatenate([means[cam_vi][cam_ids], means[lmk_vi][lmk_ids]], axis=-1)
    jac, r0 = linearize_block(fb, x)
    if fb.valid is not None:
        # Zero padded rows at the source: they may hold non-finite values
        # (clones linearized at unrelated states), and 0 * inf = NaN.
        jac = jnp.where(fb.valid[:, None, None], jac, 0.0)
        r0 = jnp.where(fb.valid[:, None], r0, 0.0)
    w = huber_weight(fb, r0)
    if fb.prec.ndim == 2:
        jw = jac * (fb.prec * w[:, None])[:, :, None]  # Lam_meas J (weighted)
    else:
        jw = bmm(fb.prec, jac) * w[:, None, None]
    jc, jl = jac[:, :, :d_c], jac[:, :, d_c:]
    jwc, jwl = jw[:, :, :d_c], jw[:, :, d_c:]

    # Per-factor normal-equation blocks.
    a_f = bmm(bT(jwc), jc)  # [m, dc, dc]
    b_f = bmm(bT(jwc), jl)  # [m, dc, dl]
    d_f = bmm(bT(jwl), jl)  # [m, dl, dl]
    bc_f = bmv(bT(jwc), r0)
    bl_f = bmv(bT(jwl), r0)

    seg_c = functools.partial(jax.ops.segment_sum, segment_ids=cam_ids,
                              num_segments=n_c)
    seg_l = functools.partial(jax.ops.segment_sum, segment_ids=lmk_ids,
                              num_segments=n_l)

    p_lam_c, p_eta_c = _prior_terms(graph.vblocks[cam_vi], means[cam_vi])
    p_lam_l, p_eta_l = _prior_terms(graph.vblocks[lmk_vi], means[lmk_vi])
    hcc = seg_c(a_f) + p_lam_c  # [n_c, dc, dc] block diagonal of Hcc
    hll = seg_l(d_f) + p_lam_l
    if lm_damping:
        hcc = hcc + lm_damping * jnp.eye(d_c, dtype=hcc.dtype)
        hll = hll + lm_damping * jnp.eye(d_l, dtype=hll.dtype)
    bc = seg_c(bc_f) + p_eta_c
    bl = seg_l(bl_f) + p_eta_l

    hll_inv = scaled_sym_inv(hll, d_l)
    hcc_inv = scaled_sym_inv(hcc, d_c)  # block-Jacobi preconditioner

    def s_matvec(v):
        """S v = Hcc v - Hcl Hll^-1 Hlc v, via two factor reductions."""
        t_f = bmv(bT(b_f), v[cam_ids])  # [m, dl]
        y = bmv(hll_inv, seg_l(t_f))  # [n_l, dl]
        s_f = bmv(b_f, y[lmk_ids])  # [m, dc]
        return bmv(hcc, v) - seg_c(s_f)

    # Reduced rhs: r = bc - Hcl Hll^-1 bl.
    ybl = bmv(hll_inv, bl)
    rhs = bc - seg_c(bmv(b_f, ybl[lmk_ids]))

    # Preconditioned CG on [n_c, dc].
    def dot(u, v):
        return jnp.sum(u * v)

    x0 = jnp.zeros_like(rhs)
    r = rhs - s_matvec(x0)
    z = bmv(hcc_inv, r)
    p = z
    rz = dot(r, z)

    def body(_, carry):
        xk, r, p, rz = carry
        sp = s_matvec(p)
        denom = dot(p, sp)
        alpha = jnp.where(denom > 0, rz / denom, 0.0)
        xk = xk + alpha * p
        r = r - alpha * sp
        z = bmv(hcc_inv, r)
        rz_new = dot(r, z)
        beta = jnp.where(rz > 0, rz_new / rz, 0.0)
        p = z + beta * p
        return xk, r, p, rz_new

    dc, r, _, _ = jax.lax.fori_loop(0, cg_iters, body, (x0, r, p, rz))

    # Back-substitute landmarks.
    u_f = bmv(bT(b_f), dc[cam_ids])
    dl = bmv(hll_inv, bl - seg_l(u_f))

    new_means = list(means)
    new_means[cam_vi] = means[cam_vi] + dc
    new_means[lmk_vi] = means[lmk_vi] + dl
    return tuple(new_means)


def solve(graph: Graph, means: tuple, n_steps: int = 5, fi: int = 0,
          cam_vi: int = 0, lmk_vi: int = 1, cg_iters: int = 50,
          lm_damping: float = 0.0):
    """Run n_steps Gauss-Newton iterations (relinearizing each step)."""
    for _ in range(n_steps):
        means = gauss_newton_step(graph, means, fi=fi, cam_vi=cam_vi,
                                  lmk_vi=lmk_vi, cg_iters=cg_iters,
                                  lm_damping=lm_damping)
    return means


@functools.partial(jax.jit, static_argnames=("fi", "cg_iters", "lm_damping"))
@f32_exact
def gauss_newton_step_pcg(graph: Graph, means: tuple, fi: int = 0,
                          cg_iters: int = 100, lm_damping: float = 0.0):
    """One Gauss-Newton step by block-Jacobi PCG on the FULL normal equations.

    Works for any 2-slot factor block — in particular same-variable-block
    pose graphs, where the camera/landmark Schur elimination above does not
    apply.  This is the MAP quality target for the pose-graph benchmarks
    (the GBP trajectory must converge to the same fixed point; reference
    analogue: the dense `joint_distribution_inf` oracle, SURVEY.md §3.4,
    which this matvec form scales far beyond).  Returns the new means tuple.
    """
    fb = graph.fblocks[fi]
    offs = fb.offsets

    x = jnp.concatenate([means[vb][fb.adj[k]] for k, vb in enumerate(fb.vblocks)],
                        axis=-1)
    jac, r0 = linearize_block(fb, x)
    if fb.valid is not None:
        jac = jnp.where(fb.valid[:, None, None], jac, 0.0)
        r0 = jnp.where(fb.valid[:, None], r0, 0.0)
    w = huber_weight(fb, r0)

    def wmul(u):  # Lam_meas-weighted residual-space product [m, z]
        if fb.prec.ndim == 2:
            return u * fb.prec * w[:, None]
        return bmv(fb.prec, u) * w[:, None]

    js = [jac[:, :, o:o + d] for o, d in zip(offs, fb.dofs)]
    segs = [functools.partial(jax.ops.segment_sum, segment_ids=fb.adj[k],
                              num_segments=graph.vblocks[vb].count)
            for k, vb in enumerate(fb.vblocks)]

    # rhs b = J^T W r0 + prior pull (per variable block, summed over slots).
    rhs = [_prior_terms(vb, mu)[1] for vb, mu in zip(graph.vblocks, means)]
    wr = wmul(r0)
    for k, vb in enumerate(fb.vblocks):
        rhs[vb] = rhs[vb] + segs[k](bmv(bT(js[k]), wr))

    def h_matvec(v):
        u = sum(bmv(js[k], v[vb][fb.adj[k]]) for k, vb in enumerate(fb.vblocks))
        wu = wmul(u)
        out = [bmv(vb.prior_lam, vk) + (lm_damping * vk if lm_damping else 0.0)
               for vb, vk in zip(graph.vblocks, v)]
        for k, vb in enumerate(fb.vblocks):
            out[vb] = out[vb] + segs[k](bmv(bT(js[k]), wu))
        return tuple(out)

    # Block-Jacobi preconditioner: per-variable diagonal blocks of H.
    pinv = []
    for vi, vb in enumerate(graph.vblocks):
        d = vb.dof
        blk = vb.prior_lam
        if lm_damping:
            blk = blk + lm_damping * jnp.eye(d, dtype=blk.dtype)
        for k, tvb in enumerate(fb.vblocks):
            if tvb != vi:
                continue
            wjk = (js[k] * (fb.prec * w[:, None])[:, :, None]
                   if fb.prec.ndim == 2
                   else bmm(fb.prec, js[k]) * w[:, None, None])
            blk = blk + segs[k](bmm(bT(wjk), js[k]))
        pinv.append(scaled_sym_inv(blk, d))
    pinv = tuple(pinv)

    tdot = lambda u, v: sum(jnp.sum(a * b) for a, b in zip(u, v))
    papply = lambda r: tuple(bmv(p, rk) for p, rk in zip(pinv, r))

    x0 = tuple(jnp.zeros_like(b) for b in rhs)
    r = tuple(b - h for b, h in zip(rhs, h_matvec(x0)))
    z = papply(r)
    p = z
    rz = tdot(r, z)

    def body(_, carry):
        xk, r, p, rz = carry
        hp = h_matvec(p)
        denom = tdot(p, hp)
        alpha = jnp.where(denom > 0, rz / denom, 0.0)
        xk = tuple(a + alpha * b for a, b in zip(xk, p))
        r = tuple(a - alpha * b for a, b in zip(r, hp))
        z = papply(r)
        rz_new = tdot(r, z)
        beta = jnp.where(rz > 0, rz_new / rz, 0.0)
        p = tuple(a + beta * b for a, b in zip(z, p))
        return xk, r, p, rz_new

    dx, _, _, _ = jax.lax.fori_loop(0, cg_iters, body, (x0, r, p, rz))
    return tuple(mu + d for mu, d in zip(means, dx))


def solve_pcg(graph: Graph, means: tuple, n_steps: int = 5, fi: int = 0,
              cg_iters: int = 100, lm_damping: float = 0.0):
    """n_steps full-system PCG Gauss-Newton iterations (relinearizing)."""
    for _ in range(n_steps):
        means = gauss_newton_step_pcg(graph, means, fi=fi, cg_iters=cg_iters,
                                      lm_damping=lm_damping)
    return means
