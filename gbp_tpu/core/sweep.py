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
  3. Factor-to-variable messages (two algebraically equivalent forms, below);
     eta-damped mix with the previous message, undamped for
     num_undamped_iters sweeps after relin (C3).
  4. Variable belief = prior + segment-sum of incoming messages; means by
     closed-form small solve (C2).

Message forms
-------------
'schur' (the reference's formulation): assemble the joint potential
J^T Lam J + blockdiag(cavities), Schur-marginalize onto the target slot:
Lam_msg = Lam_aa - Lam_ab Lam_bb^-1 Lam_ba.  Mathematically fine, but in f32
the subtraction cancels O(prec_meas * J^2) ~ 1e6 rank-deficient terms down to
an O(cavity) ~ 1 result — the engine NaNs on BA problems within one sweep.

'covariance' (default; derived via the Woodbury push-through identity,
algebraically identical):

    S_a      = Sigma_meas / w + sum_{s != a} J_s C_s^-1 J_s^T      [z x z]
    Lam_msg  = J_a^T S_a^-1 J_a
    eta_msg  = J_a^T S_a^-1 (J_a x0_a + r0 + sum_{s != a} J_s (x0_s - mu_s))

where C_s / mu_s are the cavity precision/mean of slot s and w the Huber
weight.  S_a is a *sum of PSD terms* — no cancellation, messages are PSD by
construction, and the per-factor inverse is zdim x zdim (2x2 for reprojection)
plus one d x d cavity inverse per slot shared across all targets: both more
stable *and* cheaper than the reference's form.  This is the f32/TPU answer
to SURVEY.md §7 'Precision'.
"""
from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from gbp_tpu.core.graph import FactorBlock, Graph
from gbp_tpu.gaussians import Gaussian
from gbp_tpu.utils.smalllinalg import (
    bT,
    bmm,
    bmv,
    scaled_sym_inv,
    scaled_sym_solve,
    symmetrize,
)


class GBPConfig(flax.struct.PyTreeNode):
    """The reference's ~7-knob tuning surface (SURVEY.md §5 'Config')."""

    eta_damping: float = 0.4
    lam_damping: float = 0.0
    beta: float = 0.01
    num_undamped_iters: int = 6
    min_linear_iters: int = 8
    # Static fields (recompile on change).
    message_form: str = flax.struct.field(pytree_node=False, default="covariance")
    # Jitter added to cavity precisions before inversion ('covariance' form)
    # or to the marginalization pivot ('schur' form); guards f32 indefiniteness.
    cavity_jitter: float = flax.struct.field(pytree_node=False, default=0.0)
    # Relative cavity floor: cav_lam += floor * diag(belief_lam).  The cavity
    # belief - own_msg cancels catastrophically in f32 when the true cavity
    # (e.g. a 1e-5 prior at a chain end) is below eps32 * message magnitude —
    # the computed cavity goes indefinite and the sweep NaNs.  Flooring at the
    # subtraction's roundoff scale restores a valid weak cavity.  None = auto:
    # 1e-5 for f32, 0 for f64.
    cavity_floor: float | None = flax.struct.field(pytree_node=False, default=None)


class FactorState(flax.struct.PyTreeNode):
    linpoint: jnp.ndarray  # [m, tdof]
    jac: jnp.ndarray  # [m, zdim, tdof]  J at linpoint
    r0: jnp.ndarray  # [m, zdim]        residual z (-) h(linpoint)
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


def f32_exact(fn):
    """Run fn's matmuls at true-f32 precision.

    On TPU, f32 dot/einsum default to single-pass bf16 MXU (8-bit mantissa),
    which destroys the small-matrix algebra in this engine (verified: BA NaNs
    on-chip while passing on CPU).  'highest' uses multi-pass bf16 ~= f32.
    The engine's matmuls are all tiny (<= 9x9), so there is no MXU
    throughput to lose."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


# --- factor-local math ------------------------------------------------------


def _vmap_factor(fn, x, args):
    in_axes = (0, None) if args is None else (0, 0)
    return jax.vmap(fn, in_axes=in_axes)(x, args)


def linearize_block(fb: FactorBlock, x: jnp.ndarray):
    """Linearize all factors of a block at x [m, tdof] -> (jac, r0)."""
    ft = fb.ftype
    dt = x.dtype
    h = _vmap_factor(ft.meas, x, fb.args).astype(dt)  # [m, zdim]
    jac = _vmap_factor(ft.jac, x, fb.args).astype(dt)  # [m, zdim, tdof]
    r0 = jax.vmap(ft.residual)(fb.z, h).astype(dt)  # [m, zdim]
    return jac, r0


def factor_potential(fb: FactorBlock, fs: FactorState):
    """Assemble the information-form factor potential from the linearization:

        Lam_f = J^T Lam_meas J
        eta_f = J^T Lam_meas (J x0 + r0)

    (reference: Factor.compute_factor; eq.(9-10) of arXiv:1910.14139).
    Used by the oracle and the 'schur' message form; the 'covariance' form
    never materializes it.
    """
    jac, x, r0 = fs.jac, fs.linpoint, fs.r0
    jp = _apply_prec(fb.prec, jac)
    f_lam = bmm(bT(jp), jac)
    jx = bmv(jac, x)
    f_eta = bmv(bT(jp), jx + r0)
    return f_eta, f_lam


def _apply_prec(prec, v):
    """Apply measurement precision (diag [m, z] or full [m, z, z]) to [m, z, ...]."""
    if prec.ndim == 2:
        return v * prec[:, :, None] if v.ndim == 3 else v * prec
    if v.ndim == 3:
        return bmm(prec, v)
    return bmv(prec, v)


def _mahalanobis_sq(prec, r):
    if prec.ndim == 2:
        return jnp.sum(prec * r * r, axis=-1)
    return jnp.sum(r * bmv(prec, r), axis=-1)


def huber_weight(fb: FactorBlock, r0: jnp.ndarray) -> jnp.ndarray:
    """Covariance-scaling Huber weight from the linpoint residual [m].

    w = 2T/M - T^2/M^2 for M > T else 1, which makes the scaled quadratic
    energy equal the Huber cost (arXiv:1910.14139 §5.4 eq.(19-21)).
    """
    if fb.huber is None and fb.huber_arr is None:
        return jnp.ones(r0.shape[0], dtype=r0.dtype)
    m2 = _mahalanobis_sq(fb.prec, r0)
    m = jnp.sqrt(jnp.maximum(m2, 1e-12))
    t = (fb.huber_arr.astype(r0.dtype) if fb.huber_arr is not None
         else jnp.asarray(fb.huber, dtype=r0.dtype))
    w = 2.0 * t / m - (t * t) / (m * m)
    # t == 0 rows (per-factor robustification off) keep weight 1.
    return jnp.where((m > t) & (t > 0), w, 1.0)


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
    new_jac, new_r0 = linearize_block(fb, x)
    sel = eligible[:, None]
    return fs.replace(
        linpoint=jnp.where(sel, x, fs.linpoint),
        jac=jnp.where(sel[:, :, None], new_jac, fs.jac),
        r0=jnp.where(sel, new_r0, fs.r0),
        since_relin=jnp.where(eligible, 0, fs.since_relin + 1),
    )


def _damping(fs: FactorState, cfg: GBPConfig, dtype):
    damp = jnp.where(
        fs.since_relin >= cfg.num_undamped_iters, cfg.eta_damping, 0.0
    ).astype(dtype)
    ldamp = jnp.where(
        fs.since_relin >= cfg.num_undamped_iters, cfg.lam_damping, 0.0
    ).astype(dtype)
    return damp, ldamp


def _finish_messages(fs: FactorState, raw: list, cfg: GBPConfig,
                     active: jnp.ndarray | None) -> FactorState:
    """Apply damping + wildfire mask to freshly computed per-slot messages."""
    dt = raw[0].eta.dtype
    damp, ldamp = _damping(fs, cfg, dt)
    new_msg_eta, new_msg_lam = [], []
    for a, marg in enumerate(raw):
        me = (1.0 - damp[:, None]) * marg.eta + damp[:, None] * fs.msg_eta[a]
        ml = (1.0 - ldamp[:, None, None]) * marg.lam + ldamp[:, None, None] * fs.msg_lam[a]
        if active is not None:
            sel = active[:, None]
            me = jnp.where(sel, me, fs.msg_eta[a])
            ml = jnp.where(sel[:, :, None], ml, fs.msg_lam[a])
        new_msg_eta.append(me)
        new_msg_lam.append(symmetrize(ml))
    return fs.replace(msg_eta=tuple(new_msg_eta), msg_lam=tuple(new_msg_lam))


def _cavity_floor(cfg: GBPConfig, dtype) -> float:
    if cfg.cavity_floor is not None:
        return cfg.cavity_floor
    return 1e-5 if dtype == jnp.float32 else 0.0


def _floor_cavity(cav_lam, belief_lam, floor):
    """cav_lam += floor * diag(belief_lam) on the diagonal (roundoff guard).

    Eye-masked multiply, not .at[] scatter: batched scatters get tile-padded
    layouts from XLA (~60x memory blowup at millions of factors)."""
    if not floor:
        return cav_lam
    eye = jnp.eye(cav_lam.shape[-1], dtype=cav_lam.dtype)
    return cav_lam + floor * belief_lam * eye


def _messages_covariance(fb: FactorBlock, fs: FactorState, beliefs: tuple,
                         cfg: GBPConfig) -> list:
    """Covariance-form messages (see module docstring): per-slot Gaussians."""
    n_slots = len(fb.dofs)
    zdim = fb.z.shape[-1]
    dt = fs.r0.dtype
    floor = _cavity_floor(cfg, dt)
    w = huber_weight(fb, fs.r0)

    # Per-slot J_s [m, z, d_s] and cavity moments.
    offs = fb.offsets
    jacs = [fs.jac[:, :, o : o + d] for o, d in zip(offs, fb.dofs)]
    x0s = [fs.linpoint[:, o : o + d] for o, d in zip(offs, fb.dofs)]
    ps, qs = [], []
    for s in range(n_slots):
        cav_lam = beliefs[s].lam - fs.msg_lam[s]
        cav_eta = beliefs[s].eta - fs.msg_eta[s]
        cav_lam = _floor_cavity(cav_lam, beliefs[s].lam, floor)
        if cfg.cavity_jitter:
            cav_lam = cav_lam + cfg.cavity_jitter * jnp.eye(fb.dofs[s], dtype=dt)
        cav_cov = scaled_sym_inv(cav_lam, fb.dofs[s])  # C_s^-1 (covariance)
        cav_mean = bmv(cav_cov, cav_eta)
        jc = bmm(jacs[s], cav_cov)  # [m, z, d]
        ps.append(bmm(jc, bT(jacs[s])))  # J C^-1 J^T [m, z, z]
        qs.append(bmv(jacs[s], x0s[s] - cav_mean))

    # Sigma_meas / w  (Huber rescales the measurement covariance up).
    if fb.prec.ndim == 2:
        sigma = jnp.zeros((fb.count, zdim, zdim), dt).at[
            :, jnp.arange(zdim), jnp.arange(zdim)
        ].set(1.0 / fb.prec)
    else:
        sigma = scaled_sym_inv(fb.prec, zdim)
    sigma = sigma / w[:, None, None]

    out = []
    for a in range(n_slots):
        s_mat = sigma
        u = bmv(jacs[a], x0s[a]) + fs.r0
        for s in range(n_slots):
            if s == a:
                continue
            s_mat = s_mat + ps[s]
            u = u + qs[s]
        s_inv = scaled_sym_inv(symmetrize(s_mat), zdim)  # [m, z, z]
        sj = bmm(s_inv, jacs[a])  # [m, z, d_a]
        lam_msg = bmm(bT(jacs[a]), sj)
        eta_msg = bmv(bT(sj), u)
        out.append(Gaussian(eta_msg, lam_msg))
    return out


def _messages_schur(fb: FactorBlock, fs: FactorState, beliefs: tuple,
                    cfg: GBPConfig) -> list:
    """Reference-form messages: joint potential + cavities, Schur-marginalized."""
    offs = fb.offsets
    w = huber_weight(fb, fs.r0)
    f_eta, f_lam = factor_potential(fb, fs)
    base_eta = f_eta * w[:, None]
    base_lam = f_lam * w[:, None, None]
    floor = _cavity_floor(cfg, f_eta.dtype)
    cav_eta = [beliefs[k].eta - fs.msg_eta[k] for k in range(len(fb.dofs))]
    cav_lam = [
        _floor_cavity(beliefs[k].lam - fs.msg_lam[k], beliefs[k].lam, floor)
        for k in range(len(fb.dofs))
    ]

    out = []
    for a, (da, off_a) in enumerate(zip(fb.dofs, offs)):
        eta = base_eta
        lam = base_lam
        for b, (db, off_b) in enumerate(zip(fb.dofs, offs)):
            if b == a:
                continue
            eta = eta.at[:, off_b : off_b + db].add(cav_eta[b])
            lam = lam.at[:, off_b : off_b + db, off_b : off_b + db].add(cav_lam[b])
        if cfg.cavity_jitter:
            lam = lam + cfg.cavity_jitter * jnp.eye(fb.tdof, dtype=lam.dtype)
        out.append(_marginalize_onto(eta, lam, off_a, da))
    return out


def _kernel_params(cfg: GBPConfig, dt) -> jnp.ndarray:
    """The shared [7] scalar-param vector of the Pallas kernels."""
    return jnp.stack([
        jnp.asarray(cfg.eta_damping, dt),
        jnp.asarray(cfg.lam_damping, dt),
        jnp.asarray(cfg.num_undamped_iters, dt),
        jnp.asarray(_cavity_floor(cfg, dt), dt),
        jnp.asarray(cfg.beta, dt),
        jnp.asarray(cfg.min_linear_iters, dt),
        jnp.asarray(cfg.cavity_jitter, dt),
    ])


def _prec_huber_operand(fb: FactorBlock):
    """(prec 2-D operand, static huber) for the Pallas kernels.

    Per-factor thresholds (fb.huber_arr) ride as an extra trailing column of
    the prec operand — no new kernel ref (see ops/messages_pallas._win_start
    for why the ref count must not grow) — with huber static set to 'row'."""
    prec = fb.prec.reshape(fb.count, -1) if fb.prec.ndim == 3 else fb.prec
    if fb.huber_arr is None:
        return prec, fb.huber
    assert fb.prec.ndim == 2, "per-factor huber requires diagonal prec"
    return (jnp.concatenate(
        [prec, fb.huber_arr[:, None].astype(prec.dtype)], axis=1), "row")


def _messages_fused(fb: FactorBlock, fs: FactorState, beliefs: tuple,
                    cfg: GBPConfig, active: jnp.ndarray | None) -> FactorState:
    """Covariance-form messages + damping + masking in one Pallas kernel
    (gbp_tpu/ops/messages_pallas.py).  Numerically the same update as
    _messages_covariance -> _finish_messages."""
    from gbp_tpu.ops.messages_pallas import fused_messages

    d0, d1 = fb.dofs
    z = fb.z.shape[-1]
    m = fb.count
    dt = fs.r0.dtype
    params = _kernel_params(cfg, dt)
    act = jnp.ones((m,), dt) if active is None else active
    prec_op, huber = _prec_huber_operand(fb)
    oe0, ol0, oe1, ol1 = fused_messages(
        params,
        fs.jac.reshape(m, -1), fs.linpoint, fs.r0,
        prec_op,
        fs.since_relin, act,
        beliefs[0].eta, beliefs[0].lam.reshape(m, -1),
        beliefs[1].eta, beliefs[1].lam.reshape(m, -1),
        fs.msg_eta[0], fs.msg_lam[0].reshape(m, -1),
        fs.msg_eta[1], fs.msg_lam[1].reshape(m, -1),
        d0=d0, d1=d1, z=z, prec_full=fb.prec.ndim == 3, huber=huber,
        interpret=jax.default_backend() == "cpu",
    )
    return fs.replace(
        msg_eta=(oe0, oe1),
        msg_lam=(ol0.reshape(m, d0, d0), ol1.reshape(m, d1, d1)),
    )


def _use_fused_relin(cfg: GBPConfig, fb: FactorBlock) -> bool:
    """Whole-sweep fusion (relinearize + messages in one Pallas kernel) is
    available when the factor type has a component-form measurement model."""
    from gbp_tpu.ops.comp_factors import COMP_FACTORS

    entry = COMP_FACTORS.get(fb.ftype.name)
    return (
        cfg.message_form == "pallas"
        and len(fb.dofs) == 2
        and entry is not None
        # custom residuals need a component form in the registry
        and (fb.ftype.residual_fn is None or len(entry) > 2)
    )


def _fused_relin_messages(fb: FactorBlock, fs: FactorState, beliefs: tuple,
                          x: jnp.ndarray, cfg: GBPConfig,
                          active: jnp.ndarray | None) -> FactorState:
    """Relinearization + message update in one Pallas kernel pass."""
    from gbp_tpu.ops.comp_factors import COMP_FACTORS
    from gbp_tpu.ops.messages_pallas import fused_relin_messages

    d0, d1 = fb.dofs
    t = d0 + d1
    z = fb.z.shape[-1]
    m = fb.count
    dt = fs.r0.dtype
    n_args = COMP_FACTORS[fb.ftype.name][1]
    params = _kernel_params(cfg, dt)
    act = jnp.ones((m,), dt) if active is None else active
    prec_op, huber = _prec_huber_operand(fb)
    outs = fused_relin_messages(
        params, x, fb.z,
        None if n_args == 0 else fb.args,
        fs.linpoint, fs.jac.reshape(m, -1), fs.r0,
        prec_op,
        fs.since_relin, act,
        beliefs[0].eta, beliefs[0].lam.reshape(m, -1),
        beliefs[1].eta, beliefs[1].lam.reshape(m, -1),
        fs.msg_eta[0], fs.msg_lam[0].reshape(m, -1),
        fs.msg_eta[1], fs.msg_lam[1].reshape(m, -1),
        d0=d0, d1=d1, z=z, prec_full=fb.prec.ndim == 3, huber=huber,
        comp_name=fb.ftype.name, n_args=n_args,
        interpret=jax.default_backend() == "cpu",
    )
    oe0, ol0, oe1, ol1, lp, jc, r0, srel = outs
    return fs.replace(
        msg_eta=(oe0, oe1),
        msg_lam=(ol0.reshape(m, d0, d0), ol1.reshape(m, d1, d1)),
        linpoint=lp,
        jac=jc.reshape(m, z, t),
        r0=r0,
        since_relin=srel.reshape(m).astype(jnp.int32),
    )


def _compute_messages(fb: FactorBlock, fs: FactorState, beliefs: tuple,
                      cfg: GBPConfig, active: jnp.ndarray | None) -> FactorState:
    if cfg.message_form == "pallas" and len(fb.dofs) == 2:
        return _messages_fused(fb, fs, beliefs, cfg, active)
    if cfg.message_form in ("covariance", "pallas"):
        raw = _messages_covariance(fb, fs, beliefs, cfg)
    elif cfg.message_form == "schur":
        raw = _messages_schur(fb, fs, beliefs, cfg)
    else:
        raise ValueError(f"unknown message_form {cfg.message_form!r}")
    return _finish_messages(fs, raw, cfg, active)


def _marginalize_onto(eta, lam, off, d) -> Gaussian:
    """Schur-marginalize joint [m, t] onto the contiguous block [off, off+d)
    (delegates to gaussians.marginalize — one implementation, used by both
    the engine and library callers)."""
    from gbp_tpu.gaussians import marginalize

    return marginalize(eta, lam, off, d)


# --- graph-level steps ------------------------------------------------------


def _pack_msgs(fs: FactorState, slot: int) -> jnp.ndarray:
    """Messages of one slot packed as a single wide 2D array [m, d + d*d].

    TPU gathers/scatters of narrow [m, d] rows and 3D [m, d, d] operands
    lower to near-serial row copies (measured 60+ ms/sweep at 470k factors);
    the same data moved as one wide 2D array runs at memory bandwidth."""
    me = fs.msg_eta[slot]
    ml = fs.msg_lam[slot]
    return jnp.concatenate([me, ml.reshape(ml.shape[0], -1)], axis=1)


@f32_exact
def update_beliefs(graph: Graph, state: GBPState) -> GBPState:
    """belief = prior (+) sum of factor->variable messages (SURVEY.md C2).

    Two lowerings of the same sum: dense-inbox gather+reduce when the graph
    carries precomputed inboxes (single-chip fast path: TPU scatter serializes
    and dominated the sweep), segment_sum scatter otherwise (multi-chip GSPMD
    path: psum of partial scatter sums beats all-gathering factor messages).
    Both operate on (eta|lam)-packed wide rows — see _pack_msgs.
    """
    new_v = []
    for vi, vb in enumerate(graph.vblocks):
        d = vb.dof
        packed = jnp.concatenate(
            [vb.prior_eta, vb.prior_lam.reshape(vb.count, -1)], axis=1
        )
        specs = None if graph.inboxes is None else graph.inboxes[vi]
        if specs is not None:
            for spec in specs:
                mp = _pack_msgs(state.f[spec.fi], spec.slot)
                g = mp[spec.idx]  # [n, max_deg, d + d*d]
                packed = packed + jnp.sum(
                    jnp.where(spec.mask[:, :, None], g, 0.0), axis=1
                )
        else:
            for fi, fb in enumerate(graph.fblocks):
                for k, target in enumerate(fb.vblocks):
                    if target != vi:
                        continue
                    mp = _pack_msgs(state.f[fi], k)
                    if fb.ell_slot == k:
                        # ELL layout: contiguous reshape-sum, no scatter.
                        # Padded rows' messages are identically zero (they
                        # are never active), so no mask is needed.
                        packed = packed + jnp.sum(
                            mp.reshape(vb.count, fb.ell_deg, -1), axis=1
                        )
                    else:
                        packed = packed + jax.ops.segment_sum(
                            mp, fb.adj[k], num_segments=vb.count
                        )
        eta = packed[:, :d]
        lam = packed[:, d:].reshape(vb.count, d, d)
        mean = scaled_sym_solve(lam, eta)
        new_v.append(VariableState(eta=eta, lam=lam, mean=mean))
    return state.replace(v=tuple(new_v))


def _gather_beliefs_and_means(graph: Graph, state: GBPState, fi: int):
    """Per-factor adjacent beliefs + means in ONE wide 2D gather per slot.

    Packs each variable block's (eta | lam | mean) into [n, 2d + d*d] rows so
    the per-factor gather moves wide contiguous rows (see _pack_msgs for why),
    then splits.  Returns (beliefs tuple, linpoint x [m, tdof])."""
    fb = graph.fblocks[fi]
    beliefs, means = [], []
    for k, vb in enumerate(fb.vblocks):
        vs = state.v[vb]
        n, d = vs.eta.shape
        packed = jnp.concatenate(
            [vs.eta, vs.lam.reshape(n, -1), vs.mean], axis=1
        )
        if fb.ell_slot == k:
            # ELL layout: row r belongs to variable r // ell_deg — the
            # "gather" is a broadcast + reshape, no data-dependent indexing.
            f = packed.shape[-1]
            packed = jnp.broadcast_to(
                packed[:, None, :], (n, fb.ell_deg, f)
            ).reshape(n * fb.ell_deg, f)
        else:
            packed = packed[fb.adj[k]]
        beliefs.append(
            Gaussian(packed[:, :d], packed[:, d:-d].reshape(-1, d, d))
        )
        means.append(packed[:, -d:])
    return tuple(beliefs), jnp.concatenate(means, axis=-1)


def _gather_beliefs(graph: Graph, state: GBPState, fi: int) -> tuple:
    return _gather_beliefs_and_means(graph, state, fi)[0]


@f32_exact
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
        if fb.valid is not None:
            act = fb.valid if act is None else (act & fb.valid)
        beliefs, x = _gather_beliefs_and_means(graph, state, fi)
        if _use_fused_relin(cfg, fb):
            fs = _fused_relin_messages(fb, fs, beliefs, x, cfg, act)
        else:
            fs = _relinearize(fb, fs, x, cfg, act)
            fs = _compute_messages(fb, fs, beliefs, cfg, act)
        new_f.append(fs)
    state = state.replace(f=tuple(new_f))
    return update_beliefs(graph, state)


@f32_exact
def run(graph: Graph, state: GBPState, cfg: GBPConfig, n_iters: int) -> GBPState:
    """Run n_iters synchronous sweeps inside one compiled loop.

    The n_iters loop is a `lax.fori_loop`, so a whole convergence run is a
    single XLA computation (the unit the bench measures as sweeps/s)."""

    def body(_, s):
        return sweep(graph, s, cfg)

    return jax.lax.fori_loop(0, n_iters, body, state)


@jax.jit
@f32_exact
def init_state(graph: Graph, means: tuple) -> GBPState:
    """Initial state: beliefs = priors, all factors linearized at `means`,
    zero messages (reference: graph construction, SURVEY.md §3.2).  Jitted:
    eager construction dispatches thousands of tiny ops, which is ~40 s over
    a remote-TPU link vs ~2 s compiled."""
    vstates = []
    for vb, mu in zip(graph.vblocks, means):
        vstates.append(VariableState(eta=vb.prior_eta, lam=vb.prior_lam, mean=mu))
    state = GBPState(v=tuple(vstates), f=())
    fstates = []
    for fi, fb in enumerate(graph.fblocks):
        x = jnp.concatenate(
            [means[vb][fb.adj[k]] for k, vb in enumerate(fb.vblocks)], axis=-1
        )
        jac, r0 = linearize_block(fb, x)
        dt = jac.dtype
        fstates.append(
            FactorState(
                linpoint=x,
                jac=jac,
                r0=r0,
                msg_eta=tuple(jnp.zeros((fb.count, d), dt) for d in fb.dofs),
                msg_lam=tuple(jnp.zeros((fb.count, d, d), dt) for d in fb.dofs),
                since_relin=jnp.zeros(fb.count, jnp.int32),
            )
        )
    return state.replace(f=tuple(fstates))


@f32_exact
def energy(graph: Graph, state: GBPState) -> jnp.ndarray:
    """Total (Huber-adjusted) energy at the current belief means.

    0.5 M^2 inside the quadratic region, T*M - 0.5 T^2 beyond
    (reference: Graph.energy; SURVEY.md C4)."""
    total = jnp.asarray(0.0, dtype=state.v[0].mean.dtype)
    for fi, fb in enumerate(graph.fblocks):
        x = gather_linpoint(graph, state, fi)
        h = _vmap_factor(fb.ftype.meas, x, fb.args)
        r = jax.vmap(fb.ftype.residual)(fb.z, h)
        m2 = _mahalanobis_sq(fb.prec, r)
        if fb.huber is None and fb.huber_arr is None:
            e = 0.5 * m2
        else:
            mm = jnp.sqrt(jnp.maximum(m2, 1e-12))
            t = (fb.huber_arr.astype(mm.dtype) if fb.huber_arr is not None
                 else jnp.asarray(fb.huber, dtype=mm.dtype))
            e = jnp.where((mm > t) & (t > 0),
                          t * mm - 0.5 * t * t, 0.5 * m2)
        if fb.valid is not None:
            e = jnp.where(fb.valid, e, 0.0)
        total = total + jnp.sum(e)
    return total
