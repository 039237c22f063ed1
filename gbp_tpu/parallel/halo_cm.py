"""Component-major fast path under halo partitioning.

VERDICT r1 item 5: the round-1 multi-chip paths dropped the ELL layout that
the single-chip sweep's speed comes from, so per-chip throughput under
partitioning was far below the single-chip rate.  This module gives each
chip the SAME resident component-major sweep as core/sweep_cm.py — per-chip
ELL grouping (rows grouped by the chip-local ELL-slot variable, uniform
degree), factor state living in kernel layout [F, T, LANE] across sweeps,
the fused Pallas relinearize/message kernels, reshape-sum + one-hot-MXU
belief reductions — and splices the halo exchange (parallel/halo.py) into
the belief update: the ELL reshape-sum naturally produces partial sums for
the chip's whole local universe (owned + ghosts), which is exactly what the
exchange consumes.

Eligibility mirrors sweep_cm.prepare (single 2-slot factor block with a
component-form measurement model — custom residuals need a component
residual in the registry — and diagonal precision; the slots may reference
the SAME variable block, e.g. pose graphs, whose two partial sums combine
before one exchange); ineligible graphs stay on the generic halo path.
"""
from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gbp_tpu.core import sweep as sweep_mod
from gbp_tpu.core.sweep import GBPConfig, VariableState, f32_exact
from gbp_tpu.core.sweep_cm import CMFactorState, _rm2cm
from gbp_tpu.ops.messages_pallas import (
    LANE,
    SUB,
    TILE,
    fused_messages_cm,
    fused_relin_cm,
    segsum_cm,
    segsum_cm_blk,
)
from gbp_tpu.parallel import halo as halo_mod


class HaloCMGraph(flax.struct.PyTreeNode):
    """Static per-chip CM factor data, stacked [P, ...]; comm/priors reused
    from the generic halo partition."""

    vblocks: tuple  # owned priors per vblock [P, n_own_max, ...]
    comm: tuple  # HaloComm per vblock
    z: jnp.ndarray  # [P, zdim, T, LANE]
    prec: jnp.ndarray  # [P, zdim, T, LANE]
    args: jnp.ndarray | None  # [P, n_args, T, LANE]
    act: jnp.ndarray  # [P, 1, T, LANE]
    gidx_cm: jnp.ndarray  # [P, 1, T, LANE] int32: gathered-slot LOCAL ids
    gidx_rm: jnp.ndarray  # [P, mp] int32
    mp: int = flax.struct.field(pytree_node=False, default=0)
    nv: int = flax.struct.field(pytree_node=False, default=0)
    deg: int = flax.struct.field(pytree_node=False, default=0)
    e: int = flax.struct.field(pytree_node=False, default=0)  # ELL slot
    vb_e: int = flax.struct.field(pytree_node=False, default=0)
    vb_g: int = flax.struct.field(pytree_node=False, default=0)
    dofs: tuple = flax.struct.field(pytree_node=False, default=())
    zdim: int = flax.struct.field(pytree_node=False, default=0)
    comp_name: str = flax.struct.field(pytree_node=False, default="")
    n_args: int = flax.struct.field(pytree_node=False, default=0)
    huber: float | None = flax.struct.field(pytree_node=False, default=None)
    n_loc_e: int = flax.struct.field(pytree_node=False, default=0)
    n_loc_g: int = flax.struct.field(pytree_node=False, default=0)
    segsum_exact: bool = flax.struct.field(pytree_node=False, default=True)
    # 'table': gathered-slot beliefs reconstructed in-kernel from a VMEM
    # table (core/sweep_cm.py gather_mode='table'); 'rows': HBM expansion.
    gather_mode: str = flax.struct.field(pytree_node=False, default="rows")
    # Per-chip camera windows (VERDICT r3 item 3): each grid tile's OWNED
    # gathered-slot ids lie in [win_starts[c, i], ... + win_w); ghost ids
    # (>= n_own_max, at the END of the local universe by construction) are
    # reconstructed from a small full ghost table instead — the two one-hot
    # dots simply add (an out-of-range id matches nothing).  The locality
    # ordering comes FREE from halo.partition(order_keys=...): per-chip
    # slot numbering is not user-visible, so no vperm/relabeling cost.
    # Windows engage only where they pay: partitioning itself already
    # shrinks the per-chip table, so this matters at >= ~512 owned
    # cams/chip (city-scale pods).
    win_starts: jnp.ndarray | None = None  # [P, n_tiles] int32
    gidx_ghost_cm: jnp.ndarray | None = None  # [P, 1, T, LANE] rebased ids
    cut_ids: jnp.ndarray | None = None  # [P, win_ncut] owned cams dup'd
    win_w: int = flax.struct.field(pytree_node=False, default=0)
    win_ngp: int = flax.struct.field(pytree_node=False, default=0)
    win_ncut: int = flax.struct.field(pytree_node=False, default=0)
    # In-kernel ELL fusion (mirrors core/sweep_cm.CMGraph.ell_fused): the
    # relin/message kernels reconstruct the ELL slot from per-tile blocked
    # group-window slices instead of reading an expanded [F, mp] broadcast —
    # bitwise-equal, and removes the broadcast (slow at lane-misaligned deg)
    # from the per-chip sweep.  The group map is row//deg — identical on
    # every chip — so the starts are a HOST-STATIC tuple and the per-chip
    # slices lower to static lax.slice copies (core/sweep_cm._start_slices).
    ell_starts_t: tuple | None = flax.struct.field(
        pytree_node=False, default=None)
    ell_w2: int = flax.struct.field(pytree_node=False, default=0)
    ell_nvp: int = flax.struct.field(pytree_node=False, default=0)
    ell_fused: bool = flax.struct.field(pytree_node=False, default=False)


class HaloCMState(flax.struct.PyTreeNode):
    v: tuple  # owned VariableState per vblock [P, n_own_max, ...]
    ghost: tuple  # ghost VariableState per vblock [P, n_ghost_max, ...]
    f: CMFactorState  # leaves [P, F, T, LANE]


def prepare(hp: halo_mod.HaloProblem,
            segsum_exact: bool = True, gather_mode: str = "auto",
            window: bool = True, ell_fused: bool | None = None):
    """Build the per-chip ELL/CM layout for a generic HaloProblem, or None
    if the graph is ineligible (falls back to the generic halo sweep).

    gather_mode 'auto' picks the in-kernel VMEM belief table for the
    gathered slot when it fits (the single-chip fast path), else 'rows'.
    window=True additionally enables per-chip camera windows when they pay
    (see HaloCMGraph.win_starts)."""
    from gbp_tpu.ops.comp_factors import COMP_FACTORS

    g = hp.src_graph
    if len(g.fblocks) != 1:
        return None
    fb = g.fblocks[0]
    entry = COMP_FACTORS.get(fb.ftype.name)
    if (
        len(fb.dofs) != 2
        or entry is None
        # custom residuals need a component form (see core/sweep_cm.prepare)
        or (fb.ftype.residual_fn is not None and len(entry) < 3)
        or fb.prec.ndim != 2
    ):
        return None
    P_ = hp.n_chips
    hfb = hp.hgraph.fblocks[0]
    m_loc = hfb.z.shape[1]
    # ELL slot: group by the larger variable block so the remaining gather
    # reads the small table (same heuristic as GraphBuilder._ell_reorder).
    counts = [g.vblocks[v].count for v in fb.vblocks]
    e = 0 if counts[0] >= counts[1] else 1
    gs = 1 - e
    vb_e, vb_g = fb.vblocks[e], fb.vblocks[gs]
    c_e = hp.hgraph.comm[vb_e]
    c_g = hp.hgraph.comm[vb_g]
    n_loc_e = c_e.n_own_max + max(c_e.n_ghost_max, 1)
    n_loc_g = c_g.n_own_max + max(c_g.n_ghost_max, 1)

    adj_e = np.asarray(hfb.adj[e])  # [P, m_loc] local ids
    adj_g = np.asarray(hfb.adj[gs])
    valid = np.asarray(hfb.valid)  # [P, m_loc]
    deg = 1
    for c in range(P_):
        ids = adj_e[c][valid[c]]
        if ids.size:
            deg = max(deg, int(np.bincount(ids).max()))
    # pad the ELL universe so rows = nv * deg is TILE-aligned
    nv = n_loc_e
    while (nv * deg) % TILE:
        nv += 1
    mp = nv * deg
    if mp > 6 * max(int(valid.sum(1).max()), 1) and mp - m_loc > 64 * TILE:
        return None

    # Per-chip reorder: dest row = local_ell_id * deg + rank; clone padding.
    src = np.zeros((P_, mp), dtype=np.int64)  # into [m_loc] local rows
    act = np.zeros((P_, mp), dtype=np.float64)
    for c in range(P_):
        rows = np.flatnonzero(valid[c])
        ids = adj_e[c][rows]
        order = np.argsort(ids, kind="stable")
        rows = rows[order]
        ids = ids[order]
        degc = np.bincount(ids, minlength=nv)
        starts = np.concatenate([[0], np.cumsum(degc)])
        rank = np.arange(rows.size) - starts[ids]
        dest = ids * deg + rank
        first = np.zeros(nv, dtype=np.int64)
        has = degc > 0
        first[has] = rows[starts[:-1][has]]
        if has.any() and not has.all():
            # Empty/pad groups clone the NEAREST previous non-empty group's
            # first row (forward-fill; leading empties back-fill), so their
            # gathered-slot ids stay inside their neighbors' camera window
            # — cloning row 0 would inject a far-away camera id into tail
            # tiles and blow the per-tile window spans.
            idxs = np.where(has, np.arange(nv), -1)
            ff = np.maximum.accumulate(idxs)
            ff[ff < 0] = np.flatnonzero(has)[0]
            first = first[ff]
        src[c] = np.repeat(first, deg)
        src[c, dest] = rows
        act[c, dest] = 1.0

    dt = hfb.z.dtype
    z_np = np.asarray(hfb.z)
    prec_np = np.asarray(hfb.prec)
    huber = fb.huber
    if fb.huber_arr is not None:
        # Per-factor thresholds ride as an extra trailing prec component
        # (ops/messages_pallas huber='row'; see core/sweep._prec_huber_operand).
        prec_np = np.concatenate(
            [prec_np, np.asarray(hfb.huber_arr)[..., None]], axis=-1)
        huber = "row"
    args_np = None if hfb.args is None else np.asarray(hfb.args)
    n_args = COMP_FACTORS[fb.ftype.name][1]

    def stack_cm(a_np, fill=None):
        # a_np [P, m_loc, F] -> CM [P, F, T, LANE] via per-chip reorder
        out = a_np[np.arange(P_)[:, None], src]  # [P, mp, F]
        return jnp.stack([_rm2cm(jnp.asarray(out[c], dtype=dt))
                          for c in range(P_)])

    gidx = adj_g[np.arange(P_)[:, None], src].astype(np.int32)  # [P, mp]
    d_g = fb.dofs[gs]
    if gather_mode in ("auto", "table"):
        ncp = ((n_loc_g + LANE - 1) // LANE) * LANE
        fits = (2 * d_g + d_g * d_g) * ncp * 4 <= 4 * 1024 * 1024
        gather_mode = "table" if fits else "rows"

    # Per-chip camera windows over the OWNED gathered-slot range.  Ghost
    # cams sit at the end of the local universe and get a small full-table
    # dot of their own; rows of ghost-ELL/pad GROUPS referencing owned cams
    # ("cut rows" — boundary landmarks owned elsewhere, looking back at
    # this chip's cut cameras from the END of the ELL universe) would blow
    # the per-tile spans, so their ids are REMAPPED into an extension of
    # the ghost table that duplicates those boundary-camera beliefs; their
    # reductions scatter-add back onto the owned sums (static `cut_ids`
    # wiring, zero per-sweep permutes).  One static width across
    # chips/tiles; gated on the dots actually shrinking vs the full local
    # table.
    win_starts = gidx_ghost = cut_ids = None
    win_w = win_ngp = win_ncut = 0
    no_g, ng_g = c_g.n_own_max, max(c_g.n_ghost_max, 1)
    n_own_e = c_e.n_own_max
    if window and gather_mode == "table":
        nopad = ((no_g + SUB - 1) // SUB) * SUB
        # main rows = rows of OWNED-ELL groups; edge rows (ghost-ELL +
        # pad groups) are remapped below.
        main = (np.arange(mp) // deg < n_own_e)[None, :]  # [1, mp]
        own = np.where(main & (gidx < no_g), gidx, -1).reshape(P_, -1, TILE)
        has_own = (own >= 0).any(-1)
        mins = np.where(has_own, np.where(own >= 0, own, no_g).min(-1), 0)
        maxs = np.where(has_own, own.max(-1), 0)
        w = (int((maxs - mins).max()) + 1 + SUB + LANE - 1) // LANE * LANE
        # cut rows: edge rows referencing OWNED cams.
        edge_own = (~main) & (gidx < no_g)
        cuts = [np.unique(gidx[c][edge_own[c]]) for c in range(P_)]
        ncut = max((len(x) for x in cuts), default=0)
        ncutp = ((ncut + SUB - 1) // SUB) * SUB if ncut else 0
        ngp = ((ng_g + LANE - 1) // LANE) * LANE
        ncp_full = ((n_loc_g + LANE - 1) // LANE) * LANE
        if 2 * (w + ngp + ncutp) <= ncp_full:
            starts = np.clip(mins, 0, max(nopad - w, 0)) // SUB * SUB
            assert (np.where(has_own, maxs, starts) < starts + w).all()
            # Remap cut rows: owned id -> no_g + ngp + position in the
            # chip's cut list (the extension rows of the ghost table).
            gidx = gidx.copy()
            cut_np = np.zeros((P_, max(ncutp, 1)), dtype=np.int32)
            for c in range(P_):
                cut_np[c, : len(cuts[c])] = cuts[c]
                if len(cuts[c]):
                    lut = np.full(no_g, -1, dtype=np.int64)
                    lut[cuts[c]] = np.arange(len(cuts[c]))
                    sel = edge_own[c]
                    gidx[c][sel] = (no_g + ngp + lut[gidx[c][sel]]).astype(
                        np.int32)
            win_starts = jnp.asarray(starts, jnp.int32)
            win_w, win_ngp, win_ncut = int(w), int(ngp), int(max(ncutp, 1))
            cut_ids = jnp.asarray(cut_np)
            # Ghost-table ids (ghosts + cut extension) rebased to the
            # table's row space; sentinel (out of range) for window rows.
            sentinel = ngp + win_ncut
            gg = np.where(gidx >= no_g, gidx - no_g, sentinel).astype(
                np.int32)
            gidx_ghost = jnp.stack([
                _rm2cm(jnp.asarray(gg[c][:, None])) for c in range(P_)
            ]).astype(jnp.int32)

    # ELL group windows for the in-kernel ELL fusion (chip-independent:
    # the group map is row // deg) — mirrors core/sweep_cm.prepare.
    ell_starts_t = None
    ell_w2 = ell_nvp = 0
    if gather_mode == "table" and deg > 1:
        n_tiles = mp // TILE
        w2 = ((TILE // deg + 2) + SUB + LANE - 1) // LANE * LANE
        nvp = max(((nv + SUB - 1) // SUB) * SUB, w2)
        st2 = (np.arange(n_tiles) * TILE // deg) // SUB * SUB
        st2 = np.clip(st2, 0, nvp - w2)
        grp = np.arange(mp) // deg
        tl = grp.reshape(-1, TILE)
        assert (tl.min(1) >= st2).all() and (tl.max(1) < st2 + w2).all()
        ell_starts_t = tuple(int(s) for s in st2)
        ell_w2, ell_nvp = int(w2), int(nvp)
    if ell_fused is None:
        ell_fused = True
    ell_fused = bool(ell_fused) and gather_mode == "table" and ell_w2 > 0

    hcm = HaloCMGraph(
        vblocks=hp.hgraph.vblocks,
        comm=hp.hgraph.comm,
        z=stack_cm(z_np),
        prec=stack_cm(prec_np),
        args=None if (args_np is None or n_args == 0)
        else stack_cm(args_np.reshape(P_, m_loc, -1)),
        act=jnp.stack([_rm2cm(jnp.asarray(act[c : c + 1].T, dtype=dt))
                       for c in range(P_)]),
        gidx_cm=jnp.stack([
            _rm2cm(jnp.asarray(gidx[c][:, None])) for c in range(P_)
        ]).astype(jnp.int32),
        gidx_rm=jnp.asarray(gidx),
        mp=mp, nv=nv, deg=deg, e=e, vb_e=vb_e, vb_g=vb_g,
        dofs=fb.dofs, zdim=fb.z.shape[-1],
        comp_name=fb.ftype.name, n_args=n_args, huber=huber,
        n_loc_e=n_loc_e, n_loc_g=n_loc_g, segsum_exact=segsum_exact,
        gather_mode=gather_mode,
        win_starts=win_starts, gidx_ghost_cm=gidx_ghost, cut_ids=cut_ids,
        win_w=win_w, win_ngp=win_ngp, win_ncut=win_ncut,
        ell_starts_t=ell_starts_t, ell_w2=ell_w2, ell_nvp=ell_nvp,
        ell_fused=ell_fused,
    )
    # global ids per reordered row (host-side, for init_state)
    rows_global = hp.fb_src_rows[0][np.arange(P_)[:, None], src]
    rows_global = np.maximum(rows_global, 0)
    return hcm, rows_global


def init_state(hp: halo_mod.HaloProblem, hcm: HaloCMGraph,
               rows_global: np.ndarray, means: tuple) -> HaloCMState:
    """Owned/ghost beliefs = priors; CM factor state linearized at means."""
    base = halo_mod.init_state(hp, means)  # reuse the variable-state builder
    g = hp.src_graph
    fb = g.fblocks[0]
    P_ = hp.n_chips
    mp = hcm.mp
    x = np.concatenate(
        [np.asarray(means[vb])[np.asarray(fb.adj[k])[rows_global]]
         for k, vb in enumerate(fb.vblocks)], axis=-1)  # [P, mp, t]
    t = x.shape[-1]
    dt = hcm.z.dtype
    xj = jnp.asarray(x.reshape(P_ * mp, t), dtype=dt)
    flat_fb = fb.replace(
        z=jnp.reshape(jnp.swapaxes(hcm.z.reshape(P_, hcm.zdim, mp), 1, 2),
                      (P_ * mp, hcm.zdim)),
        prec=jnp.reshape(
            jnp.swapaxes(hcm.prec[:, : hcm.zdim].reshape(P_, hcm.zdim, mp),
                         1, 2), (P_ * mp, hcm.zdim)),
        args=None if hcm.args is None else jnp.reshape(
            jnp.swapaxes(hcm.args.reshape(P_, hcm.args.shape[1], mp), 1, 2),
            (P_ * mp, hcm.args.shape[1])),
    )
    jac, r0 = sweep_mod.linearize_block(flat_fb, xj)
    zd = hcm.zdim
    to_cm = lambda a: jnp.stack([
        _rm2cm(a.reshape(P_, mp, -1)[c]) for c in range(P_)
    ])
    t_tiles = mp // LANE
    zeros = lambda f: jnp.zeros((P_, f, t_tiles, LANE), dt)
    d0, d1 = hcm.dofs
    fstate = CMFactorState(
        lp=to_cm(xj),
        jac=to_cm(jac.reshape(P_ * mp, -1)),
        r0=to_cm(r0),
        srel=zeros(1),
        msg_eta=(zeros(d0), zeros(d1)),
        msg_lam=(zeros(d0 * d0), zeros(d1 * d1)),
    )
    return HaloCMState(v=base.v, ghost=base.ghost, f=fstate)


def _pack_local(vs_own, vs_ghost, n_pad, d):
    """[owned | ghost | identity pad] packed rows [n_pad, 2d + d^2]."""
    pk = jnp.concatenate([
        jnp.concatenate([vs_own.eta, vs_ghost.eta]),
        jnp.concatenate([vs_own.lam, vs_ghost.lam]).reshape(-1, d * d),
        jnp.concatenate([vs_own.mean, vs_ghost.mean]),
    ], axis=1)
    n = pk.shape[0]
    if n_pad > n:
        from gbp_tpu.gaussians import packed_identity_row

        idrow = packed_identity_row(d, pk.dtype)
        pk = jnp.concatenate([pk, jnp.tile(idrow[None], (n_pad - n, 1))])
    return pk


def expand_means(hcm: HaloCMGraph, state: HaloCMState) -> jnp.ndarray:
    """Adjacent belief means per LOCAL factor in CM layout [tdof, T, LANE]
    (slot-0 components first) — chip-local, runs inside shard_map.  The halo
    schedule variants (parallel/schedules.py) score per-factor urgency from
    this without running the full belief expansion (mirrors
    core/sweep_cm.expand_means)."""
    d_e, d_g = hcm.dofs[hcm.e], hcm.dofs[1 - hcm.e]
    t_tiles = hcm.mp // LANE
    me = jnp.concatenate([state.v[hcm.vb_e].mean, state.ghost[hcm.vb_e].mean])
    if hcm.nv > me.shape[0]:
        me = jnp.concatenate(
            [me, jnp.zeros((hcm.nv - me.shape[0], d_e), me.dtype)])
    cm_e = jnp.broadcast_to(
        jnp.swapaxes(me, 0, 1)[:, :, None], (d_e, hcm.nv, hcm.deg)
    ).reshape(d_e, t_tiles, LANE)
    mg = jnp.concatenate([state.v[hcm.vb_g].mean, state.ghost[hcm.vb_g].mean])
    if hcm.n_loc_g > mg.shape[0]:
        mg = jnp.concatenate(
            [mg, jnp.zeros((hcm.n_loc_g - mg.shape[0], d_g), mg.dtype)])
    cm_g = jnp.take(jnp.swapaxes(mg, 0, 1), hcm.gidx_rm,
                    axis=1).reshape(d_g, t_tiles, LANE)
    m0, m1 = (cm_e, cm_g) if hcm.e == 0 else (cm_g, cm_e)
    return jnp.concatenate([m0, m1], axis=0)


def _sweep_cm_halo(hcm: HaloCMGraph, state: HaloCMState, cfg: GBPConfig,
                   axis: str, active: jnp.ndarray | None = None,
                   skip_exchange: bool = False) -> HaloCMState:
    """One synchronous sweep on a chip's shard (inside shard_map).

    active: optional chip-local CM-layout [1, T, LANE] (or row-major [mp])
    factor mask for the halo schedule variants (parallel/schedules.py) —
    composes with the validity mask exactly as in core/sweep_cm.sweep."""
    d_e, d_g = hcm.dofs[hcm.e], hcm.dofs[1 - hcm.e]
    dt = state.f.r0.dtype
    if active is not None:
        if active.ndim == 1:
            active = _rm2cm(active.astype(dt)[:, None])
        hcm = hcm.replace(act=hcm.act * active.astype(dt))
    params = sweep_mod._kernel_params(cfg, dt)
    interp = jax.default_backend() == "cpu"
    t_tiles = hcm.mp // LANE

    # Belief tables -> CM expansion (unfused) or per-tile ELL group-window
    # slices for the in-kernel ELL fusion (hcm.ell_fused; the broadcast
    # never exists).
    pk_e = _pack_local(state.v[hcm.vb_e], state.ghost[hcm.vb_e], hcm.nv, d_e)
    pk_g = _pack_local(state.v[hcm.vb_g], state.ghost[hcm.vb_g],
                       hcm.n_loc_g, d_g)
    d2e, d2g = d_e * d_e, d_g * d_g
    if hcm.ell_fused:
        from gbp_tpu.core.sweep_cm import _start_slices

        pkTe = jnp.swapaxes(
            jnp.pad(pk_e, ((0, hcm.ell_nvp - pk_e.shape[0]), (0, 0))), 0, 1)
        ltab = _start_slices(pkTe, None, hcm.ell_starts_t, hcm.ell_w2)
        lbtab, lmtab = ltab[:, : d_e + d2e], ltab[:, d_e + d2e :]
        ell_starts = jnp.asarray(hcm.ell_starts_t, jnp.int32)
    else:
        cm_e = jnp.broadcast_to(
            jnp.swapaxes(pk_e, 0, 1)[:, :, None],
            (pk_e.shape[1], hcm.nv, hcm.deg),
        ).reshape(pk_e.shape[1], t_tiles, LANE)
        be_e, bl_e, mean_e = (cm_e[:d_e], cm_e[d_e : d_e + d2e],
                              cm_e[d_e + d2e :])
    d0, d1 = hcm.dofs
    fs = state.f
    if hcm.gather_mode == "table" and hcm.win_w:
        # Per-chip camera windows: owned beliefs from per-tile window
        # slices, ghost beliefs from the small full ghost table; the two
        # one-hot reconstructions add (see HaloCMGraph.win_starts).
        from gbp_tpu.ops.messages_pallas import (
            fused_messages_cm_tabblkg,
            fused_relin_cm_tabblkg,
        )

        no = hcm.comm[hcm.vb_g].n_own_max
        nopad = ((no + SUB - 1) // SUB) * SUB
        ownT = jnp.swapaxes(
            jnp.pad(pk_g[:no], ((0, nopad - no), (0, 0))), 0, 1)
        w = hcm.win_w

        def slice_one(s):
            return jax.lax.dynamic_slice(
                ownT, (jnp.zeros((), s.dtype), s), (ownT.shape[0], w))

        wtab = jax.vmap(slice_one)(hcm.win_starts)  # [n_tiles, F, w]
        # Ghost table = [ghost beliefs (pad to ngp) | cut-camera beliefs]:
        # the extension duplicates boundary-camera rows referenced by
        # ghost-ELL groups (see prepare's cut-row remap).
        gtab = jnp.swapaxes(jnp.concatenate([
            jnp.pad(pk_g[no:],
                    ((0, hcm.win_ngp - (pk_g.shape[0] - no)), (0, 0))),
            pk_g[hcm.cut_ids],
        ]), 0, 1)  # [F, ngp + ncut]
        bw, mw = wtab[:, : d_g + d2g], wtab[:, d_g + d2g :]
        bg, mg = gtab[: d_g + d2g], gtab[d_g + d2g :]
        gslot = 1 - hcm.e
        if hcm.ell_fused:
            from gbp_tpu.ops.messages_pallas import (
                fused_messages_cm_tabblkg_ell,
                fused_relin_cm_tabblkg_ell,
            )

            lp, jac, r0, srel = fused_relin_cm_tabblkg_ell(
                params, ell_starts, hcm.win_starts, lmtab, mw, mg,
                hcm.gidx_cm, hcm.z, hcm.args, fs.lp, fs.jac, fs.r0, fs.srel,
                hcm.act, d0=d0, d1=d1, z=hcm.zdim, comp_name=hcm.comp_name,
                n_args=hcm.n_args, gslot=gslot, win_w=w, n_own=no,
                deg=hcm.deg, ell_w2=hcm.ell_w2, interpret=interp,
            )
            oe0, ol0, oe1, ol1 = fused_messages_cm_tabblkg_ell(
                params, ell_starts, hcm.win_starts, jac, lp, r0, hcm.prec,
                srel, hcm.act, lbtab, bw, bg, hcm.gidx_cm,
                fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
                d0=d0, d1=d1, z=hcm.zdim, prec_full=False, huber=hcm.huber,
                gslot=gslot, win_w=w, n_own=no, deg=hcm.deg,
                ell_w2=hcm.ell_w2, interpret=interp,
            )
        else:
            lp, jac, r0, srel = fused_relin_cm_tabblkg(
                params, hcm.win_starts, mean_e, mw, mg, hcm.gidx_cm, hcm.z,
                hcm.args, fs.lp, fs.jac, fs.r0, fs.srel, hcm.act,
                d0=d0, d1=d1, z=hcm.zdim, comp_name=hcm.comp_name,
                n_args=hcm.n_args, gslot=gslot, win_w=w, n_own=no,
                interpret=interp,
            )
            oe0, ol0, oe1, ol1 = fused_messages_cm_tabblkg(
                params, hcm.win_starts, jac, lp, r0, hcm.prec, srel, hcm.act,
                be_e, bl_e, bw, bg, hcm.gidx_cm,
                fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
                d0=d0, d1=d1, z=hcm.zdim, prec_full=False, huber=hcm.huber,
                gslot=gslot, win_w=w, n_own=no, interpret=interp,
            )
    elif hcm.gather_mode == "table":
        ncp = ((pk_g.shape[0] + LANE - 1) // LANE) * LANE
        tab = jnp.swapaxes(
            jnp.pad(pk_g, ((0, ncp - pk_g.shape[0]), (0, 0))), 0, 1)
        btab = tab[: d_g + d2g]
        mtab = tab[d_g + d2g :]
        gslot = 1 - hcm.e
        if hcm.ell_fused:
            from gbp_tpu.ops.messages_pallas import (
                fused_messages_cm_tab_ell,
                fused_relin_cm_tab_ell,
            )

            lp, jac, r0, srel = fused_relin_cm_tab_ell(
                params, ell_starts, lmtab, mtab, hcm.gidx_cm, hcm.z,
                hcm.args, fs.lp, fs.jac, fs.r0, fs.srel, hcm.act,
                d0=d0, d1=d1, z=hcm.zdim, comp_name=hcm.comp_name,
                n_args=hcm.n_args, gslot=gslot, deg=hcm.deg,
                ell_w2=hcm.ell_w2, interpret=interp,
            )
            oe0, ol0, oe1, ol1, gpart = fused_messages_cm_tab_ell(
                params, ell_starts, jac, lp, r0, hcm.prec, srel, hcm.act,
                lbtab, btab, hcm.gidx_cm,
                fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
                d0=d0, d1=d1, z=hcm.zdim, prec_full=False, huber=hcm.huber,
                gslot=gslot, deg=hcm.deg, ell_w2=hcm.ell_w2,
                exact=hcm.segsum_exact or fs.r0.dtype != jnp.float32,
                interpret=interp,
            )
        else:
            from gbp_tpu.ops.messages_pallas import (
                fused_messages_cm_tab,
                fused_relin_cm_tab,
            )

            lp, jac, r0, srel = fused_relin_cm_tab(
                params, mean_e, mtab, hcm.gidx_cm, hcm.z, hcm.args,
                fs.lp, fs.jac, fs.r0, fs.srel, hcm.act,
                d0=d0, d1=d1, z=hcm.zdim, comp_name=hcm.comp_name,
                n_args=hcm.n_args, gslot=gslot, interpret=interp,
            )
            oe0, ol0, oe1, ol1 = fused_messages_cm_tab(
                params, jac, lp, r0, hcm.prec, srel, hcm.act,
                be_e, bl_e, btab, hcm.gidx_cm,
                fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
                d0=d0, d1=d1, z=hcm.zdim, prec_full=False, huber=hcm.huber,
                gslot=gslot, interpret=interp,
            )
    else:
        cm_g = _rm2cm(pk_g[hcm.gidx_rm])
        be_g, bl_g, mean_g = (cm_g[:d_g], cm_g[d_g : d_g + d2g],
                              cm_g[d_g + d2g :])
        by_slot = lambda a_e, a_g: (a_e, a_g) if hcm.e == 0 else (a_g, a_e)
        be0, be1 = by_slot(be_e, be_g)
        bl0, bl1 = by_slot(bl_e, bl_g)
        mean0, mean1 = by_slot(mean_e, mean_g)
        x_cm = jnp.concatenate([mean0, mean1], axis=0)

        lp, jac, r0, srel = fused_relin_cm(
            params, x_cm, hcm.z, hcm.args, fs.lp, fs.jac, fs.r0, fs.srel,
            hcm.act,
            d0=d0, d1=d1, z=hcm.zdim, comp_name=hcm.comp_name,
            n_args=hcm.n_args, interpret=interp,
        )
        oe0, ol0, oe1, ol1 = fused_messages_cm(
            params, jac, lp, r0, hcm.prec, srel, hcm.act,
            be0, bl0, be1, bl1,
            fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
            d0=d0, d1=d1, z=hcm.zdim, prec_full=False, huber=hcm.huber,
            interpret=interp,
        )
    fs = CMFactorState(lp=lp, jac=jac, r0=r0, srel=srel,
                       msg_eta=(oe0, oe1), msg_lam=(ol0, ol1))

    # Partial sums over the local universes.
    me_e, ml_e = fs.msg_eta[hcm.e], fs.msg_lam[hcm.e]
    me_g, ml_g = fs.msg_eta[1 - hcm.e], fs.msg_lam[1 - hcm.e]
    # ELL slot: free reshape-sum (clone rows carry zero messages; the
    # kernel-folded alternative measured slower — see core/sweep_cm.sweep).
    sum_e = jnp.concatenate([
        me_e.reshape(d_e, hcm.nv, hcm.deg).sum(-1),
        ml_e.reshape(d2e, hcm.nv, hcm.deg).sum(-1),
    ])[:, : hcm.n_loc_e]
    packed_e = jnp.swapaxes(sum_e, 0, 1)
    # Gathered slot: one-hot MXU segment-sum straight off the CM messages.
    if hcm.gather_mode == "table" and hcm.win_w:
        # Windowed owned reduction + small full ghost reduction (the ghost
        # id array carries an out-of-range sentinel for owned rows).
        no = hcm.comm[hcm.vb_g].n_own_max
        sum_own = segsum_cm_blk(me_g, ml_g, hcm.gidx_cm, hcm.win_starts,
                                n_seg=no, w=hcm.win_w,
                                exact=hcm.segsum_exact, interpret=interp)
        sum_ext = segsum_cm(me_g, ml_g, hcm.gidx_ghost_cm,
                            n_seg=hcm.win_ngp + hcm.win_ncut,
                            exact=hcm.segsum_exact, interpret=interp)
        # Cut-camera partials fold back onto their true owned slots.
        sum_own = sum_own.at[:, hcm.cut_ids].add(
            sum_ext[:, hcm.win_ngp:])
        sum_g = jnp.concatenate(
            [sum_own, sum_ext[:, : hcm.n_loc_g - no]], axis=1)
    elif hcm.gather_mode == "table" and hcm.ell_fused:
        # Folded into the message kernel (bitwise-equal to segsum_cm).
        sum_g = gpart[:, : hcm.n_loc_g]
    else:
        sum_g = segsum_cm(me_g, ml_g, hcm.gidx_cm, n_seg=hcm.n_loc_g,
                          exact=hcm.segsum_exact, interpret=interp)
    packed_g = jnp.swapaxes(sum_g, 0, 1)

    # Halo exchange + owner updates (shared with the generic path).
    new_v = list(state.v)
    new_ghost = list(state.ghost)
    if hcm.vb_e == hcm.vb_g:
        # Same-block factors (pose graphs): both slots' partial sums land on
        # the one local universe — combine BEFORE the single exchange.
        ov, gv = halo_mod.exchange_and_update(
            hcm.vblocks[hcm.vb_e], hcm.comm[hcm.vb_e],
            packed_e + packed_g, state.ghost[hcm.vb_e], axis,
            skip=skip_exchange)
        new_v[hcm.vb_e], new_ghost[hcm.vb_e] = ov, gv
        return HaloCMState(v=tuple(new_v), ghost=tuple(new_ghost), f=fs)
    ov, gv = halo_mod.exchange_and_update(
        hcm.vblocks[hcm.vb_e], hcm.comm[hcm.vb_e], packed_e,
        state.ghost[hcm.vb_e], axis, skip=skip_exchange)
    new_v[hcm.vb_e], new_ghost[hcm.vb_e] = ov, gv
    ov, gv = halo_mod.exchange_and_update(
        hcm.vblocks[hcm.vb_g], hcm.comm[hcm.vb_g], packed_g,
        state.ghost[hcm.vb_g], axis, skip=skip_exchange)
    new_v[hcm.vb_g], new_ghost[hcm.vb_g] = ov, gv
    return HaloCMState(v=tuple(new_v), ghost=tuple(new_ghost), f=fs)


def _specs(hcm, state, axis):
    return (halo_mod.shard_leading(hcm, axis),
            halo_mod.shard_leading(state, axis))


def make_run(mesh: Mesh, hcm: HaloCMGraph, state: HaloCMState,
             axis: str = "graph", skip_exchange: bool = False):
    gspec, sspec = _specs(hcm, state, axis)

    @functools.partial(jax.jit, static_argnums=3)
    def run_halo_cm(hcm, state, cfg, n_iters):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(gspec, sspec, P()),
            out_specs=sspec,
            check_vma=False,
        )
        @f32_exact
        def body(hcm, state, cfg):
            hg = jax.tree_util.tree_map(lambda a: a[0], hcm)
            st = jax.tree_util.tree_map(lambda a: a[0], state)

            def one(_, s):
                return _sweep_cm_halo(hg, s, cfg, axis,
                                      skip_exchange=skip_exchange)

            out = jax.lax.fori_loop(0, n_iters, one, st)
            return jax.tree_util.tree_map(lambda a: a[None], out)

        return body(hcm, state, cfg)

    return run_halo_cm


def _ell_order_keys(graph):
    """Partition-time locality ordering for the ELL slot: key each ELL-slot
    variable by its min adjacent gathered-slot GLOBAL id, so each chip's
    per-chip ELL groups see nearby cameras and the per-chip windows become
    narrow (free — per-chip slot numbering is not user-visible)."""
    fb = graph.fblocks[0]
    if len(fb.dofs) != 2:
        return None
    counts = [graph.vblocks[v].count for v in fb.vblocks]
    e = 0 if counts[0] >= counts[1] else 1
    if fb.vblocks[e] == fb.vblocks[1 - e]:
        return None  # same-block pose graphs: natural order is local
    key = np.full(counts[e], np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(key, np.asarray(fb.adj[e]), np.asarray(fb.adj[1 - e]))
    return {fb.vblocks[e]: key}


def distribute(graph, means, mesh: Mesh, anchor_slot: int = 0,
               comm_mode: str = "auto", segsum_exact: bool = True,
               gather_mode: str = "auto", window: bool = True,
               ell_fused: bool | None = None):
    """Partition + CM-prepare + place; returns (hp, hcm, state, run_fn) or
    None when the graph is CM-ineligible."""
    axis = mesh.axis_names[0]
    hp = halo_mod.partition(graph, mesh.devices.size, anchor_slot, comm_mode,
                            order_keys=_ell_order_keys(graph) if window
                            else None)
    prepped = prepare(hp, segsum_exact=segsum_exact,
                      gather_mode=gather_mode, window=window,
                      ell_fused=ell_fused)
    if prepped is None:
        return None
    hcm, rows_global = prepped
    state = init_state(hp, hcm, rows_global, means)
    gspec, sspec = _specs(hcm, state, axis)

    def put(x, s):
        return jax.device_put(x, NamedSharding(mesh, s))

    hcm = jax.tree_util.tree_map(put, hcm, gspec)
    state = jax.tree_util.tree_map(put, state, sspec)
    return hp, hcm, state, make_run(mesh, hcm, state, axis)
