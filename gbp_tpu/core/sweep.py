"""The GBP sweep: relinearize -> robustify -> messages -> beliefs.

Functional, batched equivalent of the reference's hot loop (joeaortiz/gbp
`gbp/gbp.py` Graph.synchronous_iteration; SURVEY.md §3.1/§3.3).  All
data-dependent decisions of the reference (per-factor relinearization
triggers, Huber weights, damping warmup after relinearization) are masked
arithmetic over factor batches — no Python branching on traced values — so the
whole sweep compiles to a short chain of fused XLA ops (SURVEY.md §7).

Algorithm per sweep t (math from arXiv:2107.02308 §3, arXiv:2003.03134 §4):
  1. Relinearize factor f iff ||adjacent belief means - linpoint_f|| > beta and
     >= min_linear_iters sweeps since f last relinearized; resets f's damping
     warmup counter (C5).
  2. Huber covariance scaling from the residual at the linearization point:
     M = sqrt(r^T Lam_meas r);  w = 2T/M - T^2/M^2 if M > T else 1 (C6).
  3. Factor-to-variable messages: joint potential + cavity beliefs of the other
     slots, Schur-marginalized onto the target slot; eta-damped mix with the
     previous message, undamped for num_undamped_iters sweeps after relin (C3).
  4. Variable belief = prior + segment-sum of incoming messages; means by
     closed-form small solve (C2).
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from gbp_tpu.core.graph import FactorBlock, Graph, VariableBlock
from gbp_tpu.gaussians import Gaussian
from gbp_tpu.utils.smalllinalg import sym_inv, sym_solve, symmetrize


class GBPConfig(flax.struct.PyTreeNode):
    """The reference's ~7-knob tuning surface (SURVEY.md §5 'Config')."""

    eta_damping: float = 0.4
    lam_damping: float = 0.0
    beta: float = 0.01
    num_undamped_iters: int = 6
    min_linear_iters: int = 8
    # Jitter added to the marginalization pivot block for f32 safety (0 = off).
    # Static (recompile on change): used in a Python-level branch.
    pivot_jitter: float = flax.struct.field(pytree_node=False, default=0.0)


class FactorState(flax.struct.PyTreeNode):
    linpoint: jnp.ndarray  # [m, tdof]
    f_eta: jnp.ndarray  # [m, tdof]      (unscaled potential)
    f_lam: jnp.ndarray  # [m, tdof, tdof]
    r0: jnp.ndarray  # [m, zdim]   residual z - h(linpoint)
    msg_eta: tuple  # per slot [m, d_k]
    msg_lam: tuple  # per slot [m, d_k, d_k]
    since_relin: jnp.ndarray  # [m] int32, sweeps since last relinearization


class VariableState(flax.struct.PyTreeNode):
    eta: jnp.ndarray  # [n, d]
    lam: jnp.ndarray  # [n, d, d]
    mean: jnp.ndarray  # [n, d]


class GBPState(flax.struct.PyTreeNode):
    v: tuple  # tuple[VariableState]
    f: tuple  # tuple[FactorState]


# --- factor-local math ------------------------------------------------------


def _vmap_factor(fn, x, args):
    in_axes = (0, None) if args is None else (0, 0)
    return jax.vmap(fn, in_axes=in_axes)(x, args)


def linearize_block(fb: FactorBlock, x: jnp.ndarray):
    """Linearize all factors of a block at x [m, tdof].

    Returns (f_eta, f_lam, r0):
        Lam_f = J^T diag(prec) J
        eta_f = J^T diag(prec) (J x0 + r0),   r0 = z (-) h(x0)
    (reference: Factor.compute_factor; eq.(9-10) of arXiv:1910.14139).
    """
    ft = fb.ftype
    dt = x.dtype
    h = _vmap_factor(ft.meas, x, fb.args).astype(dt)  # [m, zdim]
    jac = _vmap_factor(ft.jac, x, fb.args).astype(dt)  # [m, zdim, tdof]
    r0 = jax.vmap(ft.residual)(fb.z, h).astype(dt)  # [m, zdim]
    jp = jac * fb.prec[:, :, None]  # J^T Lam rows
    f_lam = jnp.einsum("mzi,mzj->mij", jp, jac)
    jx = jnp.einsum("mzi,mi->mz", jac, x)
    f_eta = jnp.einsum("mzi,mz->mi", jp, jx + r0)
    return f_eta, f_lam, r0


def huber_weight(fb: FactorBlock, r0: jnp.ndarray) -> jnp.ndarray:
    """Covariance-scaling Huber weight from the linpoint residual [m].

    w = 2T/M - T^2/M^2 for M > T else 1, which makes the scaled quadratic
    energy equal the Huber cost (arXiv:1910.14139 §5.4 eq.(19-21)).
    """
    if fb.huber is None:
        return jnp.ones(r0.shape[0], dtype=r0.dtype)
    m2 = jnp.sum(fb.prec * r0 * r0, axis=-1)
    m = jnp.sqrt(jnp.maximum(m2, 1e-12))
    t = jnp.asarray(fb.huber, dtype=r0.dtype)
    w = 2.0 * t / m - (t * t) / (m * m)
    return jnp.where(m > t, w, 1.0)


def gather_linpoint(graph: Graph, state: GBPState, fi: int) -> jnp.ndarray:
    """Concatenate adjacent variable means per factor -> [m, tdof]."""
    fb = graph.fblocks[fi]
    parts = [state.v[vb].mean[fb.adj[k]] for k, vb in enumerate(fb.vblocks)]
    return jnp.concatenate(parts, axis=-1)


def _relinearize(fb: FactorBlock, fs: FactorState, x: jnp.ndarray, cfg: GBPConfig,
                 active: jnp.ndarray | None) -> FactorState:
    dist = jnp.linalg.norm(x - fs.linpoint, axis=-1)
    eligible = (dist > cfg.beta) & (fs.since_relin >= cfg.min_linear_iters)
    if active is not None:
        eligible = eligible & active
    new_eta, new_lam, new_r0 = linearize_block(fb, x)
    sel = eligible[:, None]
    return fs.replace(
        linpoint=jnp.where(sel, x, fs.linpoint),
        f_eta=jnp.where(sel, new_eta, fs.f_eta),
        f_lam=jnp.where(sel[:, :, None], new_lam, fs.f_lam),
        r0=jnp.where(sel, new_r0, fs.r0),
        since_relin=jnp.where(eligible, 0, fs.since_relin + 1),
    )


def _compute_messages(fb: FactorBlock, fs: FactorState, beliefs: tuple,
                      cfg: GBPConfig, active: jnp.ndarray | None) -> FactorState:
    """Factor -> variable messages for every slot of a block.

    beliefs: per-slot Gaussian (already gathered: eta [m, d_k], lam [m, d_k, d_k]).
    """
    m = fb.count
    offs = fb.offsets
    w = huber_weight(fb, fs.r0)
    base_eta = fs.f_eta * w[:, None]
    base_lam = fs.f_lam * w[:, None, None]

    # Cavity (variable -> factor message) per slot: belief minus the factor's
    # own previous message to that variable (SURVEY.md C3 step (c)).
    cav_eta = [beliefs[k].eta - fs.msg_eta[k] for k in range(len(fb.dofs))]
    cav_lam = [beliefs[k].lam - fs.msg_lam[k] for k in range(len(fb.dofs))]

    # Damping warmup: undamped for num_undamped_iters sweeps after relin.
    damp = jnp.where(
        fs.since_relin >= cfg.num_undamped_iters, cfg.eta_damping, 0.0
    ).astype(base_eta.dtype)
    ldamp = jnp.where(
        fs.since_relin >= cfg.num_undamped_iters, cfg.lam_damping, 0.0
    ).astype(base_eta.dtype)

    new_msg_eta, new_msg_lam = [], []
    for a, (da, off_a) in enumerate(zip(fb.dofs, offs)):
        eta = base_eta
        lam = base_lam
        for b, (db, off_b) in enumerate(zip(fb.dofs, offs)):
            if b == a:
                continue
            eta = eta.at[:, off_b : off_b + db].add(cav_eta[b])
            lam = lam.at[:, off_b : off_b + db, off_b : off_b + db].add(cav_lam[b])
        if cfg.pivot_jitter:
            tdof = fb.tdof
            lam = lam + cfg.pivot_jitter * jnp.eye(tdof, dtype=lam.dtype)
        marg = _marginalize_onto(eta, lam, off_a, da)
        me = (1.0 - damp[:, None]) * marg.eta + damp[:, None] * fs.msg_eta[a]
        ml = (1.0 - ldamp[:, None, None]) * marg.lam + ldamp[:, None, None] * fs.msg_lam[a]
        if active is not None:
            sel = active[:, None]
            me = jnp.where(sel, me, fs.msg_eta[a])
            ml = jnp.where(sel[:, :, None], ml, fs.msg_lam[a])
        new_msg_eta.append(me)
        new_msg_lam.append(symmetrize(ml))
    return fs.replace(msg_eta=tuple(new_msg_eta), msg_lam=tuple(new_msg_lam))


def _marginalize_onto(eta, lam, off, d) -> Gaussian:
    """Schur-marginalize joint [m, t] onto the contiguous block [off, off+d)."""
    t = eta.shape[-1]
    if t == d:
        # Unary factor: the "joint" is already the marginal.
        return Gaussian(eta, lam)
    perm = list(range(off, off + d)) + [i for i in range(t) if not off <= i < off + d]
    eta_p = eta[..., perm]
    lam_p = lam[..., perm, :][..., :, perm]
    eta_a, eta_b = eta_p[..., :d], eta_p[..., d:]
    lam_aa = lam_p[..., :d, :d]
    lam_ab = lam_p[..., :d, d:]
    lam_bb = lam_p[..., d:, d:]
    bb_inv = sym_inv(lam_bb, t - d)
    wmat = lam_ab @ bb_inv
    lam_m = lam_aa - wmat @ jnp.swapaxes(lam_ab, -1, -2)
    eta_m = eta_a - jnp.einsum("...ij,...j->...i", wmat, eta_b)
    return Gaussian(eta_m, lam_m)


# --- graph-level steps ------------------------------------------------------


def update_beliefs(graph: Graph, state: GBPState) -> GBPState:
    """belief = prior (+) sum of factor->variable messages (SURVEY.md C2)."""
    new_v = []
    for vi, vb in enumerate(graph.vblocks):
        eta = vb.prior_eta
        lam = vb.prior_lam
        for fi, fb in enumerate(graph.fblocks):
            fs = state.f[fi]
            for k, target in enumerate(fb.vblocks):
                if target != vi:
                    continue
                eta = eta + jax.ops.segment_sum(
                    fs.msg_eta[k], fb.adj[k], num_segments=vb.count
                )
                lam = lam + jax.ops.segment_sum(
                    fs.msg_lam[k], fb.adj[k], num_segments=vb.count
                )
        mean = sym_solve(lam, eta)
        new_v.append(VariableState(eta=eta, lam=lam, mean=mean))
    return state.replace(v=tuple(new_v))


def _gather_beliefs(graph: Graph, state: GBPState, fi: int) -> tuple:
    fb = graph.fblocks[fi]
    return tuple(
        Gaussian(state.v[vb].eta[fb.adj[k]], state.v[vb].lam[fb.adj[k]])
        for k, vb in enumerate(fb.vblocks)
    )


def sweep(graph: Graph, state: GBPState, cfg: GBPConfig,
          active: tuple | None = None) -> GBPState:
    """One synchronous GBP iteration (reference: Graph.synchronous_iteration).

    active: optional per-fblock [m] bool mask (wildfire/priority schedules,
    SURVEY.md §2 'schedules'); inactive factors keep their previous messages
    and skip relinearization.
    """
    new_f = []
    for fi, fb in enumerate(graph.fblocks):
        fs = state.f[fi]
        act = None if active is None else active[fi]
        x = gather_linpoint(graph, state, fi)
        fs = _relinearize(fb, fs, x, cfg, act)
        beliefs = _gather_beliefs(graph, state, fi)
        fs = _compute_messages(fb, fs, beliefs, cfg, act)
        new_f.append(fs)
    state = state.replace(f=tuple(new_f))
    return update_beliefs(graph, state)


def init_state(graph: Graph, means: tuple) -> GBPState:
    """Initial state: beliefs = priors, all factors linearized at `means`,
    zero messages (reference: graph construction, SURVEY.md §3.2)."""
    vstates = []
    for vb, mu in zip(graph.vblocks, means):
        vstates.append(VariableState(eta=vb.prior_eta, lam=vb.prior_lam, mean=mu))
    state = GBPState(v=tuple(vstates), f=())
    fstates = []
    for fi, fb in enumerate(graph.fblocks):
        x = jnp.concatenate(
            [means[vb][fb.adj[k]] for k, vb in enumerate(fb.vblocks)], axis=-1
        )
        f_eta, f_lam, r0 = linearize_block(fb, x)
        dt = f_eta.dtype
        fstates.append(
            FactorState(
                linpoint=x,
                f_eta=f_eta,
                f_lam=f_lam,
                r0=r0,
                msg_eta=tuple(jnp.zeros((fb.count, d), dt) for d in fb.dofs),
                msg_lam=tuple(jnp.zeros((fb.count, d, d), dt) for d in fb.dofs),
                since_relin=jnp.zeros(fb.count, jnp.int32),
            )
        )
    return state.replace(f=tuple(fstates))


def run(graph: Graph, state: GBPState, cfg: GBPConfig, n_iters: int) -> GBPState:
    """Run n_iters synchronous sweeps inside one compiled loop.

    The n_iters loop is a `lax.fori_loop`, so a whole convergence run is a
    single XLA computation (the unit the bench measures as sweeps/s)."""

    def body(_, s):
        return sweep(graph, s, cfg)

    return jax.lax.fori_loop(0, n_iters, body, state)


def energy(graph: Graph, state: GBPState) -> jnp.ndarray:
    """Total (Huber-adjusted) energy at the current belief means.

    0.5 M^2 inside the quadratic region, T*M - 0.5 T^2 beyond
    (reference: Graph.energy; SURVEY.md C4)."""
    total = jnp.asarray(0.0, dtype=state.v[0].mean.dtype)
    for fi, fb in enumerate(graph.fblocks):
        x = gather_linpoint(graph, state, fi)
        h = _vmap_factor(fb.ftype.meas, x, fb.args)
        r = jax.vmap(fb.ftype.residual)(fb.z, h)
        m2 = jnp.sum(fb.prec * r * r, axis=-1)
        if fb.huber is None:
            e = 0.5 * m2
        else:
            mm = jnp.sqrt(jnp.maximum(m2, 1e-12))
            t = jnp.asarray(fb.huber, dtype=mm.dtype)
            e = jnp.where(mm > t, t * mm - 0.5 * t * t, 0.5 * m2)
        total = total + jnp.sum(e)
    return total
