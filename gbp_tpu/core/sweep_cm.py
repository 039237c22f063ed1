"""Persistent component-major GBP sweeps — the single-chip speed path.

The generic sweep (core/sweep.py, message_form='pallas') stores factor state
row-major ([m, ...]) and transposes it to component-major ([F, T, LANE])
around every Pallas call.  Measured at 470k BA factors those transposes plus
the row-major belief expansion cost ~8 of the 13 ms/sweep — pure layout
shuffling.  This module keeps the ENTIRE factor state component-major across
sweeps, so the hot loop is:

  1. belief expansion, straight into component-major form:
       * ELL slot: the per-variable packed beliefs are transposed once
         ([n, F] -> [F, n] — tiny) and broadcast-reshaped to [F, T, LANE];
         with the ELL row invariant (row r belongs to variable r // deg) the
         broadcast is a free-layout reshape, no indexing at all;
       * gathered slot: one wide-row table gather + one transpose of the
         GATHERED data only (or a trailing-axis take — build-time choice);
  2. the two proven Pallas kernels (relinearize -> messages) operating
     directly on resident CM arrays (ops/messages_pallas.py `fused_relin_cm`,
     `fused_messages_cm`) — no transposes;
  3. belief updates: ELL slot by a free reshape-sum over the degree axis;
     gathered slot by the one-hot MXU segment-sum kernel (`segsum_cm`) that
     reads the CM messages in place.

Eligibility (falls back to core/sweep.py otherwise): a single 2-slot factor
block in ELL layout with a component-form measurement model
(ops/comp_factors.py; custom residuals — angle wrap / manifold log — need a
component residual in the registry) and diagonal measurement precision.
The two slots may reference the SAME variable block (pose-graph between
factors): the belief update then combines the ELL reshape-sum and the
segsum onto the one block.  Covers the flagship BA problems (the `ba.py`
hot loop, SURVEY.md §3.1) and SE(2)/SE(3) pose-graph SLAM (merged
odometry+loop blocks with per-factor Huber, models/pose_graph.build).

Semantics are identical to sweep.py with message_form='pallas' (same kernels,
same masked relinearization/Huber/damping); `to_gbp_state` converts for
diagnostics, checkpointing, and parity tests.
"""
from __future__ import annotations

import functools
import math

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core import sweep as sweep_mod
from gbp_tpu.core.graph import Graph
from gbp_tpu.core.sweep import (
    GBPConfig,
    GBPState,
    VariableState,
    f32_exact,
)
from gbp_tpu.ops.messages_pallas import (
    LANE,
    SUB,
    TILE,
    expand_ell_blk,
    fused_messages_cm,
    fused_relin_cm,
    scatter_windows_cm,
    segsum_cm,
    segsum_cm_blk,
)
from gbp_tpu.utils.smalllinalg import scaled_sym_solve


class CMFactorState(flax.struct.PyTreeNode):
    """Factor state resident in component-major layout [F, T, LANE]."""

    lp: jnp.ndarray  # [t, T, LANE] linearization point
    jac: jnp.ndarray  # [z*t, T, LANE]
    r0: jnp.ndarray  # [z, T, LANE]
    srel: jnp.ndarray  # [1, T, LANE] float sweeps-since-relin
    msg_eta: tuple  # per slot [d_k, T, LANE]
    msg_lam: tuple  # per slot [d_k*d_k, T, LANE]


class CMState(flax.struct.PyTreeNode):
    v: tuple  # tuple[VariableState] — row-major, same as GBPState.v
    f: CMFactorState


class CMGraph(flax.struct.PyTreeNode):
    """Static per-graph data for the CM sweep (component-major, padded)."""

    base: Graph
    z: jnp.ndarray  # [z, T, LANE]
    prec: jnp.ndarray  # [z, T, LANE] diagonal measurement precision
    args: jnp.ndarray | None  # [n_args, T, LANE]
    act: jnp.ndarray  # [1, T, LANE] float; 0 = padded/invalid row
    gidx_cm: jnp.ndarray  # [1, T, LANE] int32 gathered-slot variable ids
    gidx_rm: jnp.ndarray  # [mp] int32, same ids row-major (for the gather)
    mp: int = flax.struct.field(pytree_node=False, default=0)
    nv: int = flax.struct.field(pytree_node=False, default=0)  # virtual ELL vars
    # 'rows': gather packed [n, F] rows then transpose; 'take1': gather along
    # the trailing axis of the pre-transposed [F, n] table; 'table': no HBM
    # expansion at all — the packed table goes into kernel VMEM and rows are
    # reconstructed in-kernel by one-hot MXU dots (ops/messages_pallas.py
    # `_table_rows`).  'table' needs the table to fit VMEM; prepare() falls
    # back to 'rows' otherwise.
    gather_mode: str = flax.struct.field(pytree_node=False, default="rows")
    segsum_exact: bool = flax.struct.field(pytree_node=False, default=False)
    # Per-grid-tile camera windows for 'table' mode (ops/messages_pallas.py
    # `*_tabblk` / `segsum_cm_blk`): every gathered-slot id in grid tile i
    # lies in [win_starts[i], win_starts[i] + win_w).  win_w == 0 disables
    # windowing (full-table one-hot dots).  Cuts the reconstruction /
    # reduction MXU work by ~n_gathered/win_w on locality-rich graphs
    # (corridor / city-scale BA) where consecutive ELL groups see nearby
    # cameras; prepare() enables it only when the windows are narrow enough
    # to pay and verifies the coverage invariant (bitwise-equal math — the
    # one-hot still selects exactly one table row per factor).
    win_starts: jnp.ndarray | None = None  # [n_tiles] int32, multiples of 8
    win_w: int = flax.struct.field(pytree_node=False, default=0)
    win_ncpad: int = flax.struct.field(pytree_node=False, default=0)
    # Host-static copies of the per-tile starts (hashable tuples): the
    # window/ELL table stacks are built by STATIC lax.slice + stack — one
    # fused XLA copy at bandwidth — instead of a vmapped dynamic_slice,
    # whose gather lowering measured ~1 ms/sweep at 1280 cams (a third of
    # the whole windowed sweep).  The jnp twins above still feed the
    # kernels' SMEM params row.
    win_starts_t: tuple | None = flax.struct.field(
        pytree_node=False, default=None)
    ell_starts_t: tuple | None = flax.struct.field(
        pytree_node=False, default=None)
    # Locality sort: graphs whose ELL-group order does not correlate with
    # the gathered slot (random landmark numbering — real BAL files, the
    # corridor sim) get their ELL GROUPS sorted by min gathered id at
    # prepare time so the per-tile windows become narrow.  Round-4 form:
    # the sort RELABELS THE ELL VARIABLE BLOCK ITSELF — `base.vblocks[e]`
    # carries priors in sorted order and the resident belief state lives in
    # sorted order across sweeps, so the hot loop pays NOTHING (the first
    # implementation kept beliefs in user order and permuted per sweep;
    # measured on chip, those eperm/epos gathers ate the ENTIRE ~1.3
    # ms/sweep window saving at 1280 cams).  `vperm` maps sorted id ->
    # user id, `vinv` the inverse; the state converters
    # (to_gbp_state/from_gbp_state, init_state) restore/apply the order at
    # the boundaries.  `rowperm` maps CM row -> fb row as before.  All
    # None when the natural order is already local enough.  Only applied
    # when the two slots reference DIFFERENT variable blocks (BA-class);
    # same-block pose graphs get windows only in natural order (chain
    # numbering is already local — docs/PERFORMANCE.md).  Caveat: gauge
    # anchors addressed by id on the SORTED block would need vinv
    # coordinates — BA anchors pin the camera block, which never sorts.
    vperm: jnp.ndarray | None = None  # [n_e] int32 sorted id -> user id
    vinv: jnp.ndarray | None = None  # [n_e] int32 user id -> sorted id
    rowperm: jnp.ndarray | None = None  # [m] int32
    # Kernel ELL expansion (round 4): when LANE % deg != 0 the XLA
    # broadcast-reshape [F, nv] -> [F, mp] is a lane-misaligned relayout
    # measured at ~half the city-scene sweep (docs/PERFORMANCE.md); the
    # `expand_ell_blk` kernel reconstructs the rows from per-tile blocked
    # table slices instead (bitwise-equal one-hot selection).
    ell_starts: jnp.ndarray | None = None  # [n_tiles] int32 group starts
    ell_row0s: jnp.ndarray | None = None  # [n_tiles] int32 = i * TILE
    ell_w2: int = flax.struct.field(pytree_node=False, default=0)
    ell_nvp: int = flax.struct.field(pytree_node=False, default=0)
    # In-kernel ELL fusion (round 4, second form): the relin/messages table
    # kernels reconstruct the ELL slot's beliefs themselves from per-tile
    # blocked slices (ops/messages_pallas._ell_rows_blk), so the expanded
    # [F, mp] ELL operands never exist in HBM at all — the standalone
    # expansion (XLA broadcast OR expand_ell_blk) disappears from the sweep.
    # Bitwise-equal math; requires 'table' mode and deg >= 2.
    ell_fused: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def fb(self):
        return self.base.fblocks[0]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _rm2cm(a: jnp.ndarray) -> jnp.ndarray:
    """[mp, F] -> [F, T, LANE] (rows already padded to a TILE multiple)."""
    mp, f = a.shape
    return jnp.swapaxes(a, 0, 1).reshape(f, mp // LANE, LANE)


def _cm2rm(a: jnp.ndarray, m: int) -> jnp.ndarray:
    return jnp.swapaxes(a.reshape(a.shape[0], -1), 0, 1)[:m]


def prepare(graph: Graph, gather_mode: str = "auto",
            segsum_exact: bool = False, window: bool = True,
            ell_fused: bool | None = None, segment: bool = False):
    """Build the CM static data for `graph`, or None if ineligible.

    segment=True additionally tries the degree-class-segmented layout
    (`prepare_seg` — no ELL pad rows; returns a CMSegGraph that rides the
    same init_state/run/sweep/to_gbp_state entry points), falling back to
    the single-segment CMGraph when ineligible or not worth it.

    gather_mode "auto" picks 'table' (in-kernel VMEM belief table, the fast
    path — measured ~1.8x over 'rows' at 470k factors) when the packed
    gathered-slot table fits VMEM, else 'rows'.  window=True additionally
    enables the per-tile camera-window table kernels when the graph has
    camera locality (bitwise-equal; see CMGraph.win_w).  ell_fused None
    ("auto") fuses the ELL-slot belief expansion into the table kernels
    whenever eligible (see CMGraph.ell_fused; bitwise-equal, measured
    faster at every deg on chip); pass False to keep the standalone
    expansion (A/B benchmarking, the pre-fusion artifact path)."""
    from gbp_tpu.ops.comp_factors import COMP_FACTORS

    if segment:
        sg = prepare_seg(graph, segsum_exact=segsum_exact, window=window)
        if sg is not None:
            return sg

    if len(graph.fblocks) != 1:
        return None
    fb = graph.fblocks[0]
    entry = COMP_FACTORS.get(fb.ftype.name)
    if (
        len(fb.dofs) != 2
        or fb.ell_slot is None
        or entry is None
        # custom residuals (angle wrap / manifold log) need a component
        # form in the registry (3rd entry) for the in-kernel relin
        or (fb.ftype.residual_fn is not None and len(entry) < 3)
        or fb.prec.ndim != 2
    ):
        return None
    m = fb.count
    deg = fb.ell_deg
    lcm = TILE * deg // math.gcd(TILE, deg)
    mp = ((m + lcm - 1) // lcm) * lcm
    # Reject only genuinely degenerate padding: a large RELATIVE blowup that
    # is also large in absolute rows (small graphs pad a lot relatively but
    # the cost is negligible).
    if mp > 4 * m and mp - m > 64 * TILE:
        return None
    nv = mp // deg
    pad = mp - m
    g = 1 - fb.ell_slot
    if gather_mode in ("table", "auto"):
        # In-kernel table reconstruction: the whole packed gathered-slot
        # belief table must fit comfortably in VMEM next to the factor tiles.
        d_g = fb.dofs[g]
        n_g = graph.vblocks[fb.vblocks[g]].count
        ncp = ((n_g + LANE - 1) // LANE) * LANE
        fits = (2 * d_g + d_g * d_g) * ncp * 4 <= 4 * 1024 * 1024
        gather_mode = "table" if fits else "rows"

    dt = fb.z.dtype
    act = jnp.ones((m,), dt) if fb.valid is None else fb.valid.astype(dt)
    gidx_np = np.asarray(fb.adj[g], dtype=np.int32)

    def _windows(gp):
        """Per-grid-tile windows (starts, w, ncpad) of the edge-padded ids
        `gp`, or None if too wide to pay.  The width adds SUB slack for the
        8-aligned starts and rounds up to LANE."""
        n_g = graph.vblocks[fb.vblocks[g]].count
        ncpad = ((n_g + SUB - 1) // SUB) * SUB
        tiles = gp.reshape(-1, TILE)  # grid step i = rows [i*TILE, (i+1)*TILE)
        mins, maxs = tiles.min(1), tiles.max(1)
        w = (int((maxs - mins).max()) + 1 + SUB + LANE - 1) // LANE * LANE
        # Gate: the dots must shrink meaningfully, and the TRANSPOSED packed
        # table (Mosaic pads its component lane dim to LANE) must leave VMEM
        # room for the factor tiles.
        if 2 * w > ncpad or ncpad * LANE * 4 > 6 * 1024 * 1024:
            return None
        starts = np.maximum(np.minimum(mins, ncpad - w), 0) // SUB * SUB
        assert (maxs < starts + w).all() and (mins >= starts).all()
        return starts, w, ncpad

    edge_pad = lambda a: np.pad(a, (0, pad), mode="edge") if pad else a
    win_starts, win_w, win_ncpad = None, 0, 0
    win_starts_t = ell_starts_t = None
    vperm = vinv = rowperm = None
    if window and gather_mode == "table":
        win = _windows(edge_pad(gidx_np))
        if win is None and fb.vblocks[fb.ell_slot] != fb.vblocks[g]:
            # Natural group order is not gathered-slot-local (random
            # landmark numbering — real BAL files, the corridor sim): sort
            # the ELL groups (blocks of `deg` rows; the ELL build guarantees
            # m == n_ell * deg) by min gathered id and retry.  The sort
            # relabels the ELL variable block — see the CMGraph.vperm
            # field comment for why (per-sweep unpermutes ate the whole
            # window win).
            n_ell = m // deg
            gmin = gidx_np.reshape(n_ell, deg).min(1)
            order = np.argsort(gmin, kind="stable")
            rp = (order[:, None] * deg + np.arange(deg)).reshape(-1)
            win = _windows(edge_pad(gidx_np[rp]))
            if win is not None:
                n_e = graph.vblocks[fb.vblocks[fb.ell_slot]].count
                assert n_ell == n_e, (n_ell, n_e)  # ELL build covers all ids
                gidx_np = gidx_np[rp]
                vperm = jnp.asarray(order, jnp.int32)
                vinv = jnp.asarray(np.argsort(order), jnp.int32)
                rowperm = jnp.asarray(rp, jnp.int32)
                vbs = list(graph.vblocks)
                vb_e_blk = vbs[fb.vblocks[fb.ell_slot]]
                vbs[fb.vblocks[fb.ell_slot]] = vb_e_blk.replace(
                    prior_eta=vb_e_blk.prior_eta[vperm],
                    prior_lam=vb_e_blk.prior_lam[vperm])
                graph = graph.replace(vblocks=tuple(vbs))
        if win is not None:
            starts, w, ncpad = win
            win_starts = jnp.asarray(starts, jnp.int32)
            win_starts_t = tuple(int(s) for s in starts)
            win_w, win_ncpad = int(w), int(ncpad)

    # ELL group windows: used by the standalone expansion kernel at
    # lane-misaligned degrees (`_expand_ell`) and by the in-kernel fusion at
    # every deg >= 2 (`ell_fused` below).  deg == 1 is excluded from fusion:
    # the expansion is then an identity reshape that XLA does for free,
    # while the one-hot window would be TILE+ columns wide.
    ell_starts = ell_row0s = None
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
        ell_starts = jnp.asarray(st2, jnp.int32)
        ell_starts_t = tuple(int(s) for s in st2)
        ell_row0s = jnp.asarray(np.arange(n_tiles) * TILE, jnp.int32)
        ell_w2, ell_nvp = int(w2), int(nvp)

    if ell_fused is None:
        ell_fused = True
    ell_fused = bool(ell_fused) and gather_mode == "table" and ell_w2 > 0

    rp_np = None if rowperm is None else np.asarray(rowperm)
    perm = lambda a: a if rp_np is None else jnp.asarray(a)[rp_np]
    # Edge-pad the gathered-slot ids: padded rows carry zero messages so any
    # in-range id is inert, and the edge value keeps them inside their grid
    # tile's camera window (required by the windowed table kernels).
    gpad = edge_pad(gidx_np)
    to_cm = lambda a, fill=0.0: _rm2cm(
        jnp.pad(a if a.ndim == 2 else a[:, None],
                ((0, pad), (0, 0)), constant_values=fill))
    args = fb.args
    n_args = COMP_FACTORS[fb.ftype.name][1]
    if args is not None and n_args:
        args = to_cm(perm(args.reshape(m, -1)))
    else:
        args = None
    # Per-factor Huber thresholds ride as an extra trailing prec component
    # (see core/sweep._prec_huber_operand); pad fill 1.0 keeps pad rows'
    # weight math finite (they are act-masked anyway).
    prec_host = fb.prec if fb.huber_arr is None else jnp.concatenate(
        [fb.prec, fb.huber_arr[:, None].astype(fb.prec.dtype)], axis=1)
    return CMGraph(
        base=graph,
        z=to_cm(perm(fb.z)),
        prec=to_cm(perm(prec_host), fill=1.0),
        args=args,
        act=to_cm(perm(act)),
        gidx_cm=_rm2cm(jnp.asarray(gpad)[:, None]).astype(jnp.int32),
        gidx_rm=jnp.asarray(gpad),
        mp=mp,
        nv=nv,
        gather_mode=gather_mode,
        segsum_exact=segsum_exact,
        win_starts=win_starts,
        win_w=win_w,
        win_ncpad=win_ncpad,
        win_starts_t=win_starts_t,
        ell_starts_t=ell_starts_t,
        vperm=vperm,
        vinv=vinv,
        rowperm=rowperm,
        ell_starts=ell_starts,
        ell_row0s=ell_row0s,
        ell_w2=ell_w2,
        ell_nvp=ell_nvp,
        ell_fused=ell_fused,
    )


@jax.jit
@f32_exact
def init_state(cmg: CMGraph, means: tuple) -> CMState:
    """Beliefs = priors, factors linearized at `means`, zero messages."""
    graph = cmg.base
    fb = cmg.fb
    m = fb.count
    pad = cmg.mp - m
    t_tiles = cmg.mp // LANE
    # Beliefs live in the locality-sorted order when cmg.vperm is set (the
    # base vblock priors were permuted at prepare time); user-order `means`
    # are permuted to match.  Factor linearization below uses the USER
    # adjacency + user means (values are row-permuted afterwards).
    vmeans = list(means)
    if cmg.vperm is not None:
        e_blk = fb.vblocks[fb.ell_slot]
        vmeans[e_blk] = vmeans[e_blk][cmg.vperm]
    vstates = tuple(
        VariableState(eta=vb.prior_eta, lam=vb.prior_lam, mean=mu)
        for vb, mu in zip(graph.vblocks, vmeans)
    )
    x = jnp.concatenate(
        [means[vb][fb.adj[k]] for k, vb in enumerate(fb.vblocks)], axis=-1
    )
    jac, r0 = sweep_mod.linearize_block(fb, x)
    dt = jac.dtype
    rp = lambda a: a if cmg.rowperm is None else a[cmg.rowperm]
    to_cm = lambda a: _rm2cm(jnp.pad(rp(a), ((0, pad), (0, 0))))
    zeros = lambda f: jnp.zeros((f, t_tiles, LANE), dt)
    fstate = CMFactorState(
        lp=to_cm(x),
        jac=to_cm(jac.reshape(m, -1)),
        r0=to_cm(r0),
        srel=zeros(1),
        msg_eta=tuple(zeros(d) for d in fb.dofs),
        msg_lam=tuple(zeros(d * d) for d in fb.dofs),
    )
    return CMState(v=vstates, f=fstate)


def _pack_beliefs(vs: VariableState) -> jnp.ndarray:
    n, d = vs.eta.shape
    return jnp.concatenate([vs.eta, vs.lam.reshape(n, -1), vs.mean], axis=1)


def _expand_ell(cmg: CMGraph, vs: VariableState):
    """ELL-slot beliefs -> CM [F, T, LANE] via transpose + free reshape.

    Virtual padding variables get (eta=0, lam=I, mean=0) so padded factor
    rows' cavity inverses stay finite (their outputs are masked by act)."""
    fb = cmg.fb
    deg = fb.ell_deg
    n, d = vs.eta.shape
    pk = _pack_beliefs(vs)  # [n, F] (locality-sorted order when cmg.vperm)
    if cmg.nv > n:
        from gbp_tpu.gaussians import packed_identity_row

        pad_row = packed_identity_row(d, pk.dtype)
        pk = jnp.concatenate(
            [pk, jnp.tile(pad_row[None, :], (cmg.nv - n, 1))], axis=0
        )
    f = pk.shape[1]
    d2 = d * d
    if cmg.ell_w2 and LANE % deg != 0:
        # Kernel expansion (see CMGraph.ell_starts): per-tile blocked
        # slices of the transposed table + in-kernel one-hot selection —
        # bitwise-equal to the broadcast, ~20x cheaper at misaligned deg.
        # (Aligned degrees broadcast at full speed in XLA, so the standalone
        # kernel buys nothing there; the IN-KERNEL fusion path — ell_fused —
        # never calls _expand_ell at all.)
        pkT = jnp.swapaxes(
            jnp.pad(pk, ((0, cmg.ell_nvp - pk.shape[0]), (0, 0))), 0, 1)
        w2 = cmg.ell_w2

        def slice_one(s):
            return jax.lax.dynamic_slice(
                pkT, (jnp.zeros((), s.dtype), s), (pkT.shape[0], w2))

        ltab = jax.vmap(slice_one)(cmg.ell_starts)
        cm = expand_ell_blk(ltab, cmg.ell_starts, cmg.ell_row0s, deg=deg,
                            w2=w2, interpret=_interpret())
        return cm[:d], cm[d : d + d2], cm[d + d2 :]
    cm = jnp.broadcast_to(
        jnp.swapaxes(pk, 0, 1)[:, :, None], (f, cmg.nv, deg)
    ).reshape(f, cmg.mp // LANE, LANE)
    return cm[:d], cm[d : d + d2], cm[d + d2 :]


def expand_means(cmg: CMGraph, state: CMState) -> jnp.ndarray:
    """Adjacent belief means per factor in CM layout [tdof, T, LANE]
    (slot-0 components first).  Used by the schedule variants
    (core/schedules.py) to compute per-factor urgency without running the
    full belief expansion: the ELL slot is a free broadcast-reshape, the
    gathered slot one trailing-axis take of the tiny mean table."""
    fb = cmg.fb
    e = fb.ell_slot
    vs_e = state.v[fb.vblocks[e]]
    vs_g = state.v[fb.vblocks[1 - e]]
    deg = fb.ell_deg
    t_tiles = cmg.mp // LANE
    me = vs_e.mean  # locality-sorted order when cmg.vperm is set
    if cmg.nv > me.shape[0]:
        me = jnp.concatenate(
            [me, jnp.zeros((cmg.nv - me.shape[0], me.shape[1]), me.dtype)])
    cm_e = jnp.broadcast_to(
        jnp.swapaxes(me, 0, 1)[:, :, None], (me.shape[1], cmg.nv, deg)
    ).reshape(me.shape[1], t_tiles, LANE)
    cm_g = jnp.take(jnp.swapaxes(vs_g.mean, 0, 1), cmg.gidx_rm,
                    axis=1).reshape(vs_g.mean.shape[1], t_tiles, LANE)
    m0, m1 = (cm_e, cm_g) if e == 0 else (cm_g, cm_e)
    return jnp.concatenate([m0, m1], axis=0)


def _expand_gather(cmg: CMGraph, vs: VariableState):
    """Gathered-slot beliefs -> CM via one wide-row gather (tiny table)."""
    d = vs.eta.shape[1]
    d2 = d * d
    pk = _pack_beliefs(vs)  # [n, F]
    if cmg.gather_mode == "take1":
        cm = jnp.take(jnp.swapaxes(pk, 0, 1), cmg.gidx_rm, axis=1).reshape(
            pk.shape[1], cmg.mp // LANE, LANE
        )
    else:
        cm = _rm2cm(pk[cmg.gidx_rm])
    return cm[:d], cm[d : d + d2], cm[d + d2 :]


def ell_tables(cmg: CMGraph, vs_e: VariableState):
    """Per-grid-tile ELL group-window slices of the packed ELL-slot belief
    table — the ELL analogue of `window_tables`, feeding the in-kernel ELL
    fusion (CMGraph.ell_fused).  Returns (lbtab [n_tiles, d + d^2, ell_w2]
    belief rows for the message kernel, lmtab [n_tiles, d, ell_w2] mean rows
    for the relin kernel).  Virtual padding variables get the same
    (eta=0, lam=I, mean=0) rows as `_expand_ell` so padded factor rows'
    cavity inverses stay finite."""
    pk = _pack_beliefs(vs_e)
    n, d = vs_e.eta.shape
    if cmg.nv > n:
        from gbp_tpu.gaussians import packed_identity_row

        pad_row = packed_identity_row(d, pk.dtype)
        pk = jnp.concatenate(
            [pk, jnp.tile(pad_row[None, :], (cmg.nv - n, 1))], axis=0)
    pkT = jnp.swapaxes(
        jnp.pad(pk, ((0, cmg.ell_nvp - pk.shape[0]), (0, 0))), 0, 1)
    ltab = _start_slices(pkT, cmg.ell_starts, cmg.ell_starts_t, cmg.ell_w2)
    d2 = d * d
    return ltab[:, : d + d2], ltab[:, d + d2 :]


def _start_slices(tabT, starts, starts_t, w):
    """[n_tiles, F, w] per-tile slices tabT[:, s : s + w] for s in starts.

    Host-static starts (`starts_t`, the usual case) lower to a stack of
    STATIC lax.slice ops — one fused XLA copy at HBM bandwidth.  The
    dynamic fallback (vmapped dynamic_slice) lowers to a gather, measured
    ~1 ms/sweep at 1280 cams — a third of the whole windowed sweep —
    which single-handedly ate the camera windows' saving (VERDICT r3
    weak #3; the halo path still uses it because its per-chip starts are
    sharded data, not statics)."""
    if starts_t is not None:
        return jnp.stack([
            jax.lax.slice(tabT, (0, s), (tabT.shape[0], s + w))
            for s in starts_t])

    def slice_one(s):
        return jax.lax.dynamic_slice(
            tabT, (jnp.zeros((), s.dtype), s), (tabT.shape[0], w))

    return jax.vmap(slice_one)(starts)


def window_tables(cmg: CMGraph, pk: jnp.ndarray):
    """Per-grid-tile camera-window slices of the packed gathered-slot table.

    pk [n_g, 2d + d^2 (+mean)]; returns (bwtab [n_tiles, d + d^2, win_w] —
    the belief rows for the message kernel, mwtab [n_tiles, d, win_w] — the
    mean rows for the relin kernel).  One transposed pad + static per-tile
    slices (`_start_slices`)."""
    f_all = pk.shape[1]
    tabT = jnp.swapaxes(
        jnp.pad(pk, ((0, cmg.win_ncpad - pk.shape[0]), (0, 0))), 0, 1)
    wtab = _start_slices(tabT, cmg.win_starts, cmg.win_starts_t, cmg.win_w)
    # Packed layout is eta | lam | mean: f_all = 2d + d^2 -> d from f_all.
    dg = next(dd for dd in range(1, 16) if 2 * dd + dd * dd == f_all)
    return wtab[:, : dg + dg * dg], wtab[:, dg + dg * dg :]


@f32_exact
def sweep(cmg: CMGraph, state: CMState, cfg: GBPConfig,
          active: jnp.ndarray | None = None) -> CMState:
    """One synchronous GBP iteration on resident-CM state.

    active: optional CM-layout [1, T, LANE] (or row-major [mp]) factor mask
    for wildfire/priority schedules (core/schedules.py CM variants);
    inactive factors keep their previous messages and skip relinearization —
    the kernels' `act` operand already implements exactly this, so the
    schedule mask simply composes with the validity mask."""
    from gbp_tpu.ops.comp_factors import COMP_FACTORS

    fb = cmg.fb
    e = fb.ell_slot
    g = 1 - e
    d0, d1 = fb.dofs
    zdim = fb.z.shape[-1] if fb.z.ndim > 1 else 1
    dt = state.f.r0.dtype
    params = sweep_mod._kernel_params(cfg, dt)
    interp = _interpret()
    if active is not None:
        if active.ndim == 1:
            active = _rm2cm(active.astype(dt)[:, None])
        cmg = cmg.replace(act=cmg.act * active.astype(dt))

    vs_e = state.v[fb.vblocks[e]]
    vs_g = state.v[fb.vblocks[g]]
    fs = state.f
    n_args = COMP_FACTORS[fb.ftype.name][1]
    # 'row' = per-factor thresholds in the trailing prec component
    # (prepare() appended them when fb.huber_arr is set).
    huber = "row" if fb.huber_arr is not None else fb.huber
    if cmg.gather_mode == "table" and cmg.ell_fused:
        # Fully-fused fast path: BOTH slots' beliefs are reconstructed
        # inside the kernels (ELL slot from per-tile group-window slices,
        # gathered slot from the VMEM table / camera-window slices) — no
        # expanded belief operands in HBM at all.  Bitwise-equal to the
        # unfused paths below.
        from gbp_tpu.ops.messages_pallas import (
            fused_messages_cm_tab_ell,
            fused_messages_cm_tabblk_ell,
            fused_relin_cm_tab_ell,
            fused_relin_cm_tabblk_ell,
        )

        deg = fb.ell_deg
        d_g = fb.dofs[g]
        pk = _pack_beliefs(vs_g)
        lbtab, lmtab = ell_tables(cmg, vs_e)
        # The folded segsum partials must mirror the standalone kernels'
        # numerics (segsum_cm forces exact for non-f32 operands).
        sum_exact = cmg.segsum_exact or dt != jnp.float32
        if cmg.win_w:
            bwtab, mwtab = window_tables(cmg, pk)
            lp, jac, r0, srel = fused_relin_cm_tabblk_ell(
                params, cmg.ell_starts, cmg.win_starts, lmtab, mwtab,
                cmg.gidx_cm, cmg.z, cmg.args, fs.lp, fs.jac, fs.r0, fs.srel,
                cmg.act, d0=d0, d1=d1, z=zdim, comp_name=fb.ftype.name,
                n_args=n_args, gslot=g, win_w=cmg.win_w, deg=deg,
                ell_w2=cmg.ell_w2, interpret=interp,
            )
            oe0, ol0, oe1, ol1, gpart = fused_messages_cm_tabblk_ell(
                params, cmg.ell_starts, cmg.win_starts, jac, lp, r0,
                cmg.prec, srel, cmg.act, lbtab, bwtab, cmg.gidx_cm,
                fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
                d0=d0, d1=d1, z=zdim, prec_full=False, huber=huber,
                gslot=g, win_w=cmg.win_w, deg=deg, ell_w2=cmg.ell_w2,
                exact=sum_exact, interpret=interp,
            )
        else:
            ncp = ((pk.shape[0] + LANE - 1) // LANE) * LANE
            tab = jnp.swapaxes(
                jnp.pad(pk, ((0, ncp - pk.shape[0]), (0, 0))), 0, 1)
            btab = tab[: d_g + d_g * d_g]
            mtab = tab[d_g + d_g * d_g :]
            lp, jac, r0, srel = fused_relin_cm_tab_ell(
                params, cmg.ell_starts, lmtab, mtab, cmg.gidx_cm, cmg.z,
                cmg.args, fs.lp, fs.jac, fs.r0, fs.srel, cmg.act,
                d0=d0, d1=d1, z=zdim, comp_name=fb.ftype.name,
                n_args=n_args, gslot=g, deg=deg, ell_w2=cmg.ell_w2,
                interpret=interp,
            )
            oe0, ol0, oe1, ol1, gpart = fused_messages_cm_tab_ell(
                params, cmg.ell_starts, jac, lp, r0, cmg.prec, srel,
                cmg.act, lbtab, btab, cmg.gidx_cm,
                fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
                d0=d0, d1=d1, z=zdim, prec_full=False, huber=huber,
                gslot=g, deg=deg, ell_w2=cmg.ell_w2, exact=sum_exact,
                interpret=interp,
            )
    elif cmg.gather_mode == "table":
        be_e, bl_e, mean_e = _expand_ell(cmg, vs_e)
        # Gathered-slot beliefs never touch HBM in expanded form: the packed
        # table goes to kernel VMEM, rows are one-hot-MXU-reconstructed.
        from gbp_tpu.ops.messages_pallas import (
            fused_messages_cm_tab,
            fused_relin_cm_tab,
        )

        d_g = fb.dofs[g]
        pk = _pack_beliefs(vs_g)  # [n, 2d + d^2]
        if cmg.win_w:
            # Windowed fast path (round-4 blocked form): per-grid-tile
            # window slices of the transposed packed table are built by one
            # cheap XLA gather and delivered to the kernels as normal
            # blocked operands — value-identical to the full-table dots
            # (the one-hot still selects exactly one table row).  See
            # ops/messages_pallas._table_rows_blk for why the first
            # (VMEM-resident + dynamic-slice) windowed form was replaced.
            from gbp_tpu.ops.messages_pallas import (
                fused_messages_cm_tabblk,
                fused_relin_cm_tabblk,
            )

            bwtab, mwtab = window_tables(cmg, pk)
            lp, jac, r0, srel = fused_relin_cm_tabblk(
                params, cmg.win_starts, mean_e, mwtab, cmg.gidx_cm, cmg.z,
                cmg.args, fs.lp, fs.jac, fs.r0, fs.srel, cmg.act,
                d0=d0, d1=d1, z=zdim, comp_name=fb.ftype.name,
                n_args=n_args, gslot=g, win_w=cmg.win_w, interpret=interp,
            )
            oe0, ol0, oe1, ol1 = fused_messages_cm_tabblk(
                params, cmg.win_starts, jac, lp, r0, cmg.prec, srel, cmg.act,
                be_e, bl_e, bwtab, cmg.gidx_cm,
                fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
                d0=d0, d1=d1, z=zdim, prec_full=False, huber=huber,
                gslot=g, win_w=cmg.win_w, interpret=interp,
            )
        else:
            ncp = ((pk.shape[0] + LANE - 1) // LANE) * LANE
            tab = jnp.swapaxes(
                jnp.pad(pk, ((0, ncp - pk.shape[0]), (0, 0))), 0, 1)
            btab = tab[: d_g + d_g * d_g]
            mtab = tab[d_g + d_g * d_g :]
            lp, jac, r0, srel = fused_relin_cm_tab(
                params, mean_e, mtab, cmg.gidx_cm, cmg.z, cmg.args,
                fs.lp, fs.jac, fs.r0, fs.srel, cmg.act,
                d0=d0, d1=d1, z=zdim, comp_name=fb.ftype.name,
                n_args=n_args, gslot=g, interpret=interp,
            )
            oe0, ol0, oe1, ol1 = fused_messages_cm_tab(
                params, jac, lp, r0, cmg.prec, srel, cmg.act,
                be_e, bl_e, btab, cmg.gidx_cm,
                fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
                d0=d0, d1=d1, z=zdim, prec_full=False, huber=huber,
                gslot=g, interpret=interp,
            )
    else:
        be_e, bl_e, mean_e = _expand_ell(cmg, vs_e)
        be_g, bl_g, mean_g = _expand_gather(cmg, vs_g)
        by_slot = lambda a_e, a_g: (a_e, a_g) if e == 0 else (a_g, a_e)
        be0, be1 = by_slot(be_e, be_g)
        bl0, bl1 = by_slot(bl_e, bl_g)
        mean0, mean1 = by_slot(mean_e, mean_g)
        x_cm = jnp.concatenate([mean0, mean1], axis=0)

        lp, jac, r0, srel = fused_relin_cm(
            params, x_cm, cmg.z, cmg.args, fs.lp, fs.jac, fs.r0, fs.srel,
            cmg.act,
            d0=d0, d1=d1, z=zdim, comp_name=fb.ftype.name,
            n_args=n_args, interpret=interp,
        )
        oe0, ol0, oe1, ol1 = fused_messages_cm(
            params, jac, lp, r0, cmg.prec, srel, cmg.act,
            be0, bl0, be1, bl1,
            fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
            d0=d0, d1=d1, z=zdim, prec_full=False, huber=huber,
            interpret=interp,
        )
    fs = CMFactorState(lp=lp, jac=jac, r0=r0, srel=srel,
                       msg_eta=(oe0, oe1), msg_lam=(ol0, ol1))

    # --- belief updates -------------------------------------------------
    new_v = list(state.v)
    me_e, ml_e = fs.msg_eta[e], fs.msg_lam[e]
    me_g, ml_g = fs.msg_eta[g], fs.msg_lam[g]

    # ELL slot: padded/clone rows carry zero messages, so the plain
    # reshape-sum over the degree axis is exact (same invariant as
    # sweep.update_beliefs' ELL path).  (Folding this reduction into the
    # message kernel like the gathered slot was tried and measured a clear
    # REGRESSION — bench64 2.18 -> 2.60 ms/sweep, city 3.58 -> 4.24: the
    # per-tile group one-hot dots + segment_sum combine cost more than the
    # reshape-sum they replace, even at lane-misaligned deg.  Not adopted.)
    d_e = fb.dofs[e]
    vb_e = cmg.base.vblocks[fb.vblocks[e]]
    n_e = vb_e.count
    deg = fb.ell_deg
    sum_e = jnp.concatenate([
        me_e.reshape(d_e, cmg.nv, deg).sum(-1),
        ml_e.reshape(d_e * d_e, cmg.nv, deg).sum(-1),
    ])
    # Beliefs live in the (possibly locality-sorted) group order, so the
    # reshape-sum is already aligned — no per-sweep unpermute.
    sum_e = sum_e[:, :n_e]

    # Gathered slot: one-hot MXU segment-sum over the CM messages — folded
    # into the message kernel on the fused path (`gpart`; bitwise-equal to
    # the standalone kernels), standalone kernel launch otherwise.
    d_g = fb.dofs[g]
    vb_g = cmg.base.vblocks[fb.vblocks[g]]
    n_g = vb_g.count
    f_g = d_g + d_g * d_g
    if cmg.gather_mode == "table" and cmg.ell_fused:
        if cmg.win_w:
            # Cross-tile combine of the folded per-tile partials in a VMEM
            # scatter kernel (round 5) — the XLA segment_sum it replaces
            # measured 0.59 ms of the 2.83 ms city sweep.
            sum_g = scatter_windows_cm(
                gpart, cmg.win_starts, n_seg=n_g, w=cmg.win_w,
                ncpad=cmg.win_ncpad, interpret=interp)
        else:
            sum_g = gpart[:, :n_g]
    elif cmg.win_w:
        sum_g = segsum_cm_blk(me_g, ml_g, cmg.gidx_cm, cmg.win_starts,
                              n_seg=n_g, w=cmg.win_w,
                              exact=cmg.segsum_exact, interpret=interp)
    else:
        sum_g = segsum_cm(me_g, ml_g, cmg.gidx_cm, n_seg=n_g,
                          exact=cmg.segsum_exact, interpret=interp)

    if fb.vblocks[e] == fb.vblocks[g]:
        # Same-block 2-slot factors (pose graphs): both slots' messages land
        # on the one variable block — prior + ELL reshape-sum + segsum.
        eta = (vb_e.prior_eta + jnp.swapaxes(sum_e[:d_e], 0, 1)
               + jnp.swapaxes(sum_g[:d_e], 0, 1))
        lam = (vb_e.prior_lam
               + jnp.swapaxes(sum_e[d_e:], 0, 1).reshape(n_e, d_e, d_e)
               + jnp.swapaxes(sum_g[d_e:], 0, 1).reshape(n_e, d_e, d_e))
        new_v[fb.vblocks[e]] = VariableState(
            eta=eta, lam=lam, mean=scaled_sym_solve(lam, eta)
        )
        return CMState(v=tuple(new_v), f=fs)

    eta_e = vb_e.prior_eta + jnp.swapaxes(sum_e[:d_e], 0, 1)
    lam_e = vb_e.prior_lam + jnp.swapaxes(sum_e[d_e:], 0, 1).reshape(n_e, d_e, d_e)
    new_v[fb.vblocks[e]] = VariableState(
        eta=eta_e, lam=lam_e, mean=scaled_sym_solve(lam_e, eta_e)
    )
    eta_g = vb_g.prior_eta + jnp.swapaxes(sum_g[:d_g], 0, 1)
    lam_g = vb_g.prior_lam + jnp.swapaxes(sum_g[d_g:], 0, 1).reshape(n_g, d_g, d_g)
    new_v[fb.vblocks[g]] = VariableState(
        eta=eta_g, lam=lam_g, mean=scaled_sym_solve(lam_g, eta_g)
    )
    return CMState(v=tuple(new_v), f=fs)


@f32_exact
def run(cmg: CMGraph, state: CMState, cfg: GBPConfig, n_iters: int) -> CMState:
    """n_iters synchronous sweeps in one compiled fori_loop."""

    def body(_, s):
        return sweep(cmg, s, cfg)

    return jax.lax.fori_loop(0, n_iters, body, state)


@jax.jit
def from_gbp_state(cmg: CMGraph, state: GBPState) -> CMState:
    """Inverse of `to_gbp_state`: resume a checkpointed GBPState INTO the
    resident component-major fast path (VERDICT r2 item 8 — checkpointing was
    one-way).  Rows are re-padded to the CM tile multiple with zeros, which
    restores the layout invariants the CM sweep relies on: padded rows carry
    zero messages (exact ELL reshape-sum) and act=0 keeps them inert."""
    fb = cmg.fb
    m = fb.count
    pad = cmg.mp - m
    fs = state.f[0]
    rp = lambda a: a if cmg.rowperm is None else a[cmg.rowperm]
    to_cm = lambda a: _rm2cm(jnp.pad(
        rp(a if a.ndim == 2 else a.reshape(m, -1)), ((0, pad), (0, 0))))
    fstate = CMFactorState(
        lp=to_cm(fs.linpoint),
        jac=to_cm(fs.jac.reshape(m, -1)),
        r0=to_cm(fs.r0),
        srel=to_cm(fs.since_relin[:, None].astype(fs.r0.dtype)),
        msg_eta=tuple(to_cm(me) for me in fs.msg_eta),
        msg_lam=tuple(to_cm(ml.reshape(m, -1)) for ml in fs.msg_lam),
    )
    vstates = list(state.v)
    if cmg.vperm is not None:
        e_blk = fb.vblocks[fb.ell_slot]
        vs = vstates[e_blk]
        vstates[e_blk] = VariableState(
            eta=vs.eta[cmg.vperm], lam=vs.lam[cmg.vperm],
            mean=vs.mean[cmg.vperm])
    return CMState(v=tuple(vstates), f=fstate)


@jax.jit
def to_gbp_state(cmg: CMGraph, state: CMState) -> GBPState:
    """Convert to the row-major GBPState (diagnostics, checkpoints, tests)."""
    fb = cmg.fb
    m = fb.count
    t = fb.tdof
    z = fb.z.shape[-1]
    fs = state.f
    inv = None if cmg.rowperm is None else jnp.argsort(cmg.rowperm)
    row = (lambda a: _cm2rm(a, m)) if inv is None else (
        lambda a: _cm2rm(a, m)[inv])
    fstate = sweep_mod.FactorState(
        linpoint=row(fs.lp),
        jac=row(fs.jac).reshape(m, z, t),
        r0=row(fs.r0),
        msg_eta=tuple(row(me) for me in fs.msg_eta),
        msg_lam=tuple(
            row(ml).reshape(m, d, d) for ml, d in zip(fs.msg_lam, fb.dofs)
        ),
        since_relin=row(fs.srel).reshape(m).astype(jnp.int32),
    )
    vstates = list(state.v)
    if cmg.vperm is not None:
        # Resident beliefs live locality-sorted; restore USER variable order.
        e_blk = fb.vblocks[fb.ell_slot]
        vs = vstates[e_blk]
        vstates[e_blk] = VariableState(
            eta=vs.eta[cmg.vinv], lam=vs.lam[cmg.vinv],
            mean=vs.mean[cmg.vinv])
    return GBPState(v=tuple(vstates), f=(fstate,))


# ---------------------------------------------------------------------------
# Degree-class segmentation (round 5): the ELL pad-row attack.
#
# The ELL layout pads every landmark group to the GLOBAL max degree, which
# at city scale costs 1.23x pad rows (450,846 rows / 366,973 valid factors
# at deg-6 padding — VERDICT r4 "what's weak" #7).  Here the factor block is
# split into SEGMENTS, one per exact landmark degree (tiny classes merged
# upward), each a separate dispatch of the SAME fused table kernels with its
# own static deg / camera windows / ELL group windows — group padding
# disappears entirely (only per-segment TILE alignment remains).  Camera
# windows stay narrow because at city scale the per-tile group span is far
# below the 128-lane window floor in every class.
#
# Scope: the fully-fused fast path only (gather_mode='table' + ell_fused),
# different-variable-block graphs (BA-class; the ELL block is relabeled by
# (class, locality) — same vperm machinery as the locality sort).  Schedule
# masks, halo sharding, and same-block pose graphs stay on the
# single-segment CMGraph.
# ---------------------------------------------------------------------------


class CMSegPart(flax.struct.PyTreeNode):
    """Static + per-row data for one degree-class segment."""

    z: jnp.ndarray  # [z, T_s, LANE]
    prec: jnp.ndarray
    args: jnp.ndarray | None
    act: jnp.ndarray
    gidx_cm: jnp.ndarray
    rows: jnp.ndarray  # [mp_s] int32 fb-row indices (edge-padded)
    ell_starts: jnp.ndarray  # [n_tiles] int32 SEGMENT-LOCAL group starts
    ell_row0s: jnp.ndarray  # [n_tiles] int32 segment-local i * TILE
    win_starts: jnp.ndarray | None  # [n_tiles] int32 camera-window starts
    deg: int = flax.struct.field(pytree_node=False, default=0)
    mp: int = flax.struct.field(pytree_node=False, default=0)
    nv: int = flax.struct.field(pytree_node=False, default=0)
    n_groups: int = flax.struct.field(pytree_node=False, default=0)
    v0: int = flax.struct.field(pytree_node=False, default=0)  # global var base
    m: int = flax.struct.field(pytree_node=False, default=0)  # rows before pad
    ell_w2: int = flax.struct.field(pytree_node=False, default=0)
    win_w: int = flax.struct.field(pytree_node=False, default=0)
    # GLOBAL slice starts for the shared tables (host-static tuples).
    ell_starts_t: tuple = flax.struct.field(pytree_node=False, default=None)
    win_starts_t: tuple | None = flax.struct.field(
        pytree_node=False, default=None)


class CMSegGraph(flax.struct.PyTreeNode):
    """Static per-graph data for the degree-class-segmented CM sweep."""

    base: Graph
    parts: tuple  # tuple[CMSegPart]
    vperm: jnp.ndarray  # [n_e] int32 sorted id -> user id
    vinv: jnp.ndarray  # [n_e] int32 user id -> sorted id
    # to_gbp_state maps: concat-CM-row index per fb row (clone rows point at
    # their group's rank-0 row) — see `to_gbp_state_seg`.
    inv_map: jnp.ndarray  # [fb.count] int32
    nvp_glob: int = flax.struct.field(pytree_node=False, default=0)
    ncp: int = flax.struct.field(pytree_node=False, default=0)
    win_ncpad: int = flax.struct.field(pytree_node=False, default=0)
    segsum_exact: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def fb(self):
        return self.base.fblocks[0]

    @property
    def mp(self):  # diagnostic: total CM rows across segments
        return sum(p.mp for p in self.parts)


def prepare_seg(graph: Graph, segsum_exact: bool = False,
                window: bool = True, merge_min_rows: int = 4 * TILE,
                min_saving: float = 0.03,
                classes_mode: str = "auto") -> CMSegGraph | None:
    """Build the degree-class-segmented CM data, or None if ineligible /
    not worth it (single class, or pad-row saving below `min_saving`).

    classes_mode: "auto" partitions degrees by the alignment-aware DP
    below; "exact" forces one class per distinct degree and skips the worth-it
    gates (tests / A-B benchmarking only — exact classes measured 24%
    SLOWER than single-segment on the bench64 arc scene, where lcm(TILE,
    deg) alignment of the many high-degree classes outweighs the pad rows
    they save)."""
    from gbp_tpu.ops.comp_factors import COMP_FACTORS

    if len(graph.fblocks) != 1:
        return None
    fb = graph.fblocks[0]
    entry = COMP_FACTORS.get(fb.ftype.name)
    if (
        len(fb.dofs) != 2
        or fb.ell_slot is None
        or entry is None
        or (fb.ftype.residual_fn is not None and len(entry) < 3)
        or fb.prec.ndim != 2
        or fb.vblocks[fb.ell_slot] == fb.vblocks[1 - fb.ell_slot]
    ):
        return None
    e = fb.ell_slot
    g = 1 - e
    d_max = fb.ell_deg
    n_e = graph.vblocks[fb.vblocks[e]].count
    if fb.count != n_e * d_max:
        return None
    d_g = fb.dofs[g]
    n_g = graph.vblocks[fb.vblocks[g]].count
    ncp = ((n_g + LANE - 1) // LANE) * LANE
    if (2 * d_g + d_g * d_g) * ncp * 4 > 4 * 1024 * 1024:
        return None  # camera table must fit kernel VMEM ('table' mode gate)

    valid = fb.valid
    if valid is None:
        return None  # no padding anywhere -> single class, nothing to win
    valid_np = np.asarray(valid).reshape(n_e, d_max)
    degv = valid_np.sum(1).astype(np.int64)  # per-group real degree
    if degv.min() < 1:
        return None  # empty groups: keep the single-segment path
    gidx_np = np.asarray(fb.adj[g], dtype=np.int32)

    # --- degree classes by DP over contiguous degree ranges (descending).
    # A class covering degrees (d_lo..d_hi] pads every member group to
    # d_hi (clone rows from the ELL build fill the gap, so merging never
    # drops a row) and its REAL cost includes the lcm(TILE, d_hi) row
    # alignment — which is enormous for degrees like 63 (lcm 64512), so a
    # greedy exact-degree split can PAY MORE in alignment than it saves in
    # pad rows (measured: bench64 arc scene 512k -> 745k rows, -24%
    # throughput).  `merge_min_rows` acts as a per-class dispatch penalty
    # (extra kernel launches + combine) in row units.
    distinct = np.unique(degv)[::-1]  # descending
    cnts = {int(d): int((degv == d).sum()) for d in distinct}
    K = len(distinct)

    def cls_cost(i, j):
        """Rows cost of one class covering distinct[i..j] padded to
        distinct[i] (ell fusion needs deg >= 2)."""
        c = max(int(distinct[i]), 2)
        groups = sum(cnts[int(distinct[k])] for k in range(i, j + 1))
        lcm_c = TILE * c // math.gcd(TILE, c)
        rows = groups * c
        return ((rows + lcm_c - 1) // lcm_c) * lcm_c

    if classes_mode == "exact":
        bounds = [(i, i) for i in range(K)]
    else:
        best = [0.0] * (K + 1)
        choice = [0] * (K + 1)
        for j in range(K):
            b = None
            for i in range(j + 1):
                v = best[i] + cls_cost(i, j) + merge_min_rows
                if b is None or v < b:
                    b, choice[j + 1] = v, i
            best[j + 1] = b
        bounds = []
        j = K
        while j > 0:
            i = choice[j]
            bounds.append((i, j - 1))
            j = i
        bounds.reverse()
    classes = []  # list of (class_deg, group_mask)
    for i, j in bounds:
        c = max(int(distinct[i]), 2)
        mask = np.isin(degv, distinct[i : j + 1])
        classes.append((c, mask))
    if len(classes) < 2:
        return None
    if classes_mode != "exact":
        rows_seg = sum(cls_cost(i, j) for i, j in bounds)
        lcm_max = TILE * d_max // math.gcd(TILE, d_max)
        mp_single = ((fb.count + lcm_max - 1) // lcm_max) * lcm_max
        if rows_seg > (1.0 - min_saving) * mp_single:
            return None  # saving too small for the extra dispatches

    dt = fb.z.dtype
    act_np = np.asarray(valid, dtype=np.float64)
    prec_host = fb.prec if fb.huber_arr is None else jnp.concatenate(
        [fb.prec, fb.huber_arr[:, None].astype(fb.prec.dtype)], axis=1)
    n_args = COMP_FACTORS[fb.ftype.name][1]
    fargs = fb.args if (fb.args is not None and n_args) else None

    gmin = np.full(n_e, 2**30, dtype=np.int64)
    gv = gidx_np.reshape(n_e, d_max)
    for r in range(d_max):
        sel = valid_np[:, r]
        gmin[sel] = np.minimum(gmin[sel], gv[sel, r])

    ncpad_w = ((n_g + SUB - 1) // SUB) * SUB
    win_ok = window and (ncpad_w * LANE * 4 <= 6 * 1024 * 1024)

    parts = []
    order_parts = []
    v0 = 0
    concat_base = 0
    inv_map = np.zeros(n_e * d_max, dtype=np.int64)
    nvp_glob_need = n_e
    for c, mask in classes:
        gids = np.flatnonzero(mask)
        # class-local locality sort by min gathered id (narrow windows)
        gids = gids[np.argsort(gmin[gids], kind="stable")]
        order_parts.append(gids)
        ng = gids.size
        seg_rows = (gids[:, None] * d_max + np.arange(c)).reshape(-1)
        m_s = seg_rows.size  # == ng * c
        lcm = TILE * c // math.gcd(TILE, c)
        mp_s = ((m_s + lcm - 1) // lcm) * lcm
        pad = mp_s - m_s
        rows_p = np.pad(seg_rows, (0, pad), mode="edge")
        nv_s = mp_s // c
        n_tiles = mp_s // TILE

        # inv_map: real rows -> their concat position; clone rows (ranks
        # >= c for merged-up groups, plus all dropped d_max clones) -> the
        # group's rank-0 concat position.
        pos = concat_base + np.arange(m_s)
        inv_map[seg_rows] = pos
        rank0 = pos.reshape(ng, c)[:, 0]
        for r in range(c, d_max):
            inv_map[gids * d_max + r] = rank0

        # ELL group windows (segment-local starts for the kernel, global
        # slice starts for the shared sorted table).
        w2 = ((TILE // c + 2) + SUB + LANE - 1) // LANE * LANE
        st2 = (np.arange(n_tiles) * TILE // c) // SUB * SUB
        st2 = np.minimum(st2, np.maximum(nv_s - w2, 0))
        grp = np.arange(mp_s) // c
        tl = grp.reshape(-1, TILE)
        assert (tl.min(1) >= st2).all() and (tl.max(1) < st2 + w2).all()
        nvp_glob_need = max(nvp_glob_need, v0 + int(st2.max()) + w2)

        # camera windows per segment
        gseg = gidx_np[rows_p]
        win_starts = None
        win_starts_t = None
        win_w = 0
        if win_ok:
            tiles = gseg.reshape(-1, TILE)
            mins, maxs = tiles.min(1), tiles.max(1)
            w = (int((maxs - mins).max()) + 1 + SUB + LANE - 1) // LANE * LANE
            if 2 * w <= ncpad_w:
                starts = np.maximum(
                    np.minimum(mins, ncpad_w - w), 0) // SUB * SUB
                assert (maxs < starts + w).all() and (mins >= starts).all()
                win_starts = jnp.asarray(starts, jnp.int32)
                win_starts_t = tuple(int(s) for s in starts)
                win_w = int(w)

        to_cm = lambda a: _rm2cm(
            jnp.asarray(a)[rows_p] if a.ndim == 2
            else jnp.asarray(a)[rows_p][:, None])
        parts.append(CMSegPart(
            z=to_cm(fb.z),
            prec=to_cm(prec_host),
            args=None if fargs is None else to_cm(fargs.reshape(fb.count, -1)),
            act=_rm2cm(jnp.asarray(
                np.where(np.arange(mp_s) < m_s, act_np[rows_p], 0.0),
                dtype=dt)[:, None]),
            gidx_cm=_rm2cm(jnp.asarray(gseg)[:, None]).astype(jnp.int32),
            rows=jnp.asarray(rows_p, jnp.int32),
            ell_starts=jnp.asarray(st2, jnp.int32),
            ell_row0s=jnp.asarray(np.arange(n_tiles) * TILE, jnp.int32),
            win_starts=win_starts,
            deg=int(c), mp=int(mp_s), nv=int(nv_s), n_groups=int(ng),
            v0=int(v0), m=int(m_s), ell_w2=int(w2), win_w=win_w,
            ell_starts_t=tuple(int(v0 + s) for s in st2),
            win_starts_t=win_starts_t,
        ))
        v0 += ng
        concat_base += m_s
    assert v0 == n_e, (v0, n_e)

    if classes_mode != "exact" and any(p.win_w == 0 for p in parts):
        # Open issue (round 5): the UNWINDOWED multi-segment sweep
        # (fused_*_cm_tab_ell per class) reproducibly crashes the TPU
        # worker at bench64-arc scale — the sweep itself completes with
        # finite, readable outputs, but the NEXT compiled program
        # (to_gbp_state) hits "TPU worker crashed / kernel fault", the
        # signature of a stray out-of-bounds write.  Every windowed-part
        # run (city/venice scenes, many repeats) is clean, so the auto
        # path declines rather than risk taking down the device; the
        # single-segment engine is the proven fallback for arc-like
        # scenes.  classes_mode="exact" (tests; CPU interpret) is exempt.
        return None

    order = np.concatenate(order_parts)
    vperm = jnp.asarray(order, jnp.int32)
    vinv = jnp.asarray(np.argsort(order), jnp.int32)
    # Relabel the ELL variable block to the (class, locality) order so the
    # resident beliefs need no per-sweep permute (same mechanism as the
    # single-segment locality sort: CMGraph.vperm).
    vbs = list(graph.vblocks)
    vb_e_blk = vbs[fb.vblocks[e]]
    vbs[fb.vblocks[e]] = vb_e_blk.replace(
        prior_eta=vb_e_blk.prior_eta[vperm],
        prior_lam=vb_e_blk.prior_lam[vperm])
    graph = graph.replace(vblocks=tuple(vbs))

    # inv_map was built in USER group order on the fb rows — but seg_rows
    # index fb rows directly, so it is already consistent.  The gidx and
    # per-row data above were likewise gathered straight from fb rows.
    return CMSegGraph(
        base=graph, parts=tuple(parts), vperm=vperm, vinv=vinv,
        inv_map=jnp.asarray(inv_map, jnp.int32),
        nvp_glob=int(((nvp_glob_need + SUB - 1) // SUB) * SUB),
        ncp=int(ncp), win_ncpad=int(ncpad_w), segsum_exact=segsum_exact,
    )


def _seg_to_cm(part: CMSegPart, a: jnp.ndarray) -> jnp.ndarray:
    """fb-row array -> this segment's CM layout, ZERO-padded (padded rows
    must carry zero messages / inert factor state — same invariant as the
    single-segment path; only the static operands built in prepare_seg use
    edge padding, which keeps their math finite)."""
    rows = a[part.rows[: part.m]]
    if rows.ndim == 1:
        rows = rows[:, None]
    return _rm2cm(jnp.pad(rows, ((0, part.mp - part.m), (0, 0))))


@jax.jit
@f32_exact
def init_state_seg(sg: CMSegGraph, means: tuple) -> CMState:
    """Seg-path analogue of `init_state` (beliefs = priors, factors
    linearized at user-order `means`, zero messages)."""
    graph = sg.base
    fb = sg.fb
    vmeans = list(means)
    e_blk = fb.vblocks[fb.ell_slot]
    vmeans[e_blk] = vmeans[e_blk][sg.vperm]
    vstates = tuple(
        VariableState(eta=vb.prior_eta, lam=vb.prior_lam, mean=mu)
        for vb, mu in zip(graph.vblocks, vmeans)
    )
    x = jnp.concatenate(
        [means[vb][fb.adj[k]] for k, vb in enumerate(fb.vblocks)], axis=-1
    )
    jac, r0 = sweep_mod.linearize_block(fb, x)
    m = fb.count
    fstates = []
    for p in sg.parts:
        zeros = lambda f: jnp.zeros((f, p.mp // LANE, LANE), jac.dtype)
        fstates.append(CMFactorState(
            lp=_seg_to_cm(p, x),
            jac=_seg_to_cm(p, jac.reshape(m, -1)),
            r0=_seg_to_cm(p, r0),
            srel=zeros(1),
            msg_eta=tuple(zeros(d) for d in fb.dofs),
            msg_lam=tuple(zeros(d * d) for d in fb.dofs),
        ))
    return CMState(v=vstates, f=tuple(fstates))


def _seg_tables(sg: CMSegGraph, vs_e: VariableState, vs_g: VariableState):
    """Shared belief tables for one seg sweep: the padded transposed ELL
    table (sliced per part by GLOBAL ell starts), the padded transposed
    camera table for windowed parts, and the full camera table for
    unwindowed parts."""
    from gbp_tpu.gaussians import packed_identity_row

    pk_e = _pack_beliefs(vs_e)
    n_e = pk_e.shape[0]
    if sg.nvp_glob > n_e:
        pad_row = packed_identity_row(vs_e.eta.shape[1], pk_e.dtype)
        pk_e = jnp.concatenate(
            [pk_e, jnp.tile(pad_row[None, :], (sg.nvp_glob - n_e, 1))])
    pkT_e = jnp.swapaxes(pk_e, 0, 1)

    pk_g = _pack_beliefs(vs_g)
    tabT_g = None
    if any(p.win_w for p in sg.parts):
        tabT_g = jnp.swapaxes(
            jnp.pad(pk_g, ((0, sg.win_ncpad - pk_g.shape[0]), (0, 0))), 0, 1)
    tab_full = None
    if any(p.win_w == 0 for p in sg.parts):
        tab_full = jnp.swapaxes(
            jnp.pad(pk_g, ((0, sg.ncp - pk_g.shape[0]), (0, 0))), 0, 1)
    return pkT_e, tabT_g, tab_full


@f32_exact
def sweep_seg(sg: CMSegGraph, state: CMState, cfg: GBPConfig) -> CMState:
    """One synchronous sweep on the degree-class-segmented fast path:
    factor-side kernels dispatched per segment (same fused table kernels,
    per-segment static deg/windows), belief updates combined globally."""
    from gbp_tpu.ops.comp_factors import COMP_FACTORS
    from gbp_tpu.ops.messages_pallas import (
        fused_messages_cm_tab_ell,
        fused_messages_cm_tabblk_ell,
        fused_relin_cm_tab_ell,
        fused_relin_cm_tabblk_ell,
    )

    fb = sg.fb
    e = fb.ell_slot
    g = 1 - e
    d0, d1 = fb.dofs
    d_e, d_g = fb.dofs[e], fb.dofs[g]
    f_g = d_g + d_g * d_g
    zdim = fb.z.shape[-1]
    dt = state.f[0].r0.dtype
    params = sweep_mod._kernel_params(cfg, dt)
    interp = _interpret()
    n_args = COMP_FACTORS[fb.ftype.name][1]
    huber = "row" if fb.huber_arr is not None else fb.huber
    sum_exact = sg.segsum_exact or dt != jnp.float32

    vs_e = state.v[fb.vblocks[e]]
    vs_g = state.v[fb.vblocks[g]]
    vb_e = sg.base.vblocks[fb.vblocks[e]]
    vb_g = sg.base.vblocks[fb.vblocks[g]]
    n_e, n_g = vb_e.count, vb_g.count
    pkT_e, tabT_g, tab_full = _seg_tables(sg, vs_e, vs_g)

    new_f = []
    sum_e_parts = []
    sum_g = jnp.zeros((f_g, n_g), dt)
    for p, fs in zip(sg.parts, state.f):
        ltab = _start_slices(pkT_e, None, p.ell_starts_t, p.ell_w2)
        lbtab, lmtab = ltab[:, : d_e + d_e * d_e], ltab[:, d_e + d_e * d_e:]
        if p.win_w:
            wtab = _start_slices(tabT_g, p.win_starts, p.win_starts_t,
                                 p.win_w)
            bwtab, mwtab = wtab[:, :f_g], wtab[:, f_g:]
            lp, jac, r0, srel = fused_relin_cm_tabblk_ell(
                params, p.ell_starts, p.win_starts, lmtab, mwtab,
                p.gidx_cm, p.z, p.args, fs.lp, fs.jac, fs.r0, fs.srel,
                p.act, d0=d0, d1=d1, z=zdim, comp_name=fb.ftype.name,
                n_args=n_args, gslot=g, win_w=p.win_w, deg=p.deg,
                ell_w2=p.ell_w2, interpret=interp,
            )
            oe0, ol0, oe1, ol1, gpart = fused_messages_cm_tabblk_ell(
                params, p.ell_starts, p.win_starts, jac, lp, r0,
                p.prec, srel, p.act, lbtab, bwtab, p.gidx_cm,
                fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
                d0=d0, d1=d1, z=zdim, prec_full=False, huber=huber,
                gslot=g, win_w=p.win_w, deg=p.deg, ell_w2=p.ell_w2,
                exact=sum_exact, interpret=interp,
            )
            # Cross-tile combine of the folded windowed partials (same VMEM
            # scatter kernel as the single-segment path).
            sum_g = sum_g + scatter_windows_cm(
                gpart, p.win_starts, n_seg=n_g, w=p.win_w,
                ncpad=sg.win_ncpad, interpret=interp)
        else:
            btab = tab_full[: f_g]
            mtab = tab_full[f_g:]
            lp, jac, r0, srel = fused_relin_cm_tab_ell(
                params, p.ell_starts, lmtab, mtab, p.gidx_cm, p.z,
                p.args, fs.lp, fs.jac, fs.r0, fs.srel, p.act,
                d0=d0, d1=d1, z=zdim, comp_name=fb.ftype.name,
                n_args=n_args, gslot=g, deg=p.deg, ell_w2=p.ell_w2,
                interpret=interp,
            )
            oe0, ol0, oe1, ol1, gpart = fused_messages_cm_tab_ell(
                params, p.ell_starts, jac, lp, r0, p.prec, srel,
                p.act, lbtab, btab, p.gidx_cm,
                fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1],
                d0=d0, d1=d1, z=zdim, prec_full=False, huber=huber,
                gslot=g, deg=p.deg, ell_w2=p.ell_w2, exact=sum_exact,
                interpret=interp,
            )
            sum_g = sum_g + gpart[:, :n_g]
        new_f.append(CMFactorState(
            lp=lp, jac=jac, r0=r0, srel=srel,
            msg_eta=(oe0, oe1), msg_lam=(ol0, ol1)))
        me_e = oe0 if e == 0 else oe1
        ml_e = ol0 if e == 0 else ol1
        sum_e_parts.append(jnp.concatenate([
            me_e.reshape(d_e, p.nv, p.deg).sum(-1),
            ml_e.reshape(d_e * d_e, p.nv, p.deg).sum(-1),
        ])[:, : p.n_groups])
    sum_e = jnp.concatenate(sum_e_parts, axis=1)

    new_v = list(state.v)
    eta_e = vb_e.prior_eta + jnp.swapaxes(sum_e[:d_e], 0, 1)
    lam_e = vb_e.prior_lam + jnp.swapaxes(
        sum_e[d_e:], 0, 1).reshape(n_e, d_e, d_e)
    new_v[fb.vblocks[e]] = VariableState(
        eta=eta_e, lam=lam_e, mean=scaled_sym_solve(lam_e, eta_e))
    eta_g = vb_g.prior_eta + jnp.swapaxes(sum_g[:d_g], 0, 1)
    lam_g = vb_g.prior_lam + jnp.swapaxes(
        sum_g[d_g:], 0, 1).reshape(n_g, d_g, d_g)
    new_v[fb.vblocks[g]] = VariableState(
        eta=eta_g, lam=lam_g, mean=scaled_sym_solve(lam_g, eta_g))
    return CMState(v=tuple(new_v), f=tuple(new_f))


@jax.jit
def to_gbp_state_seg(sg: CMSegGraph, state: CMState) -> GBPState:
    """Seg-path analogue of `to_gbp_state`: clone rows (ranks above their
    group's class degree) take their group's rank-0 values — which is
    exactly what the ELL build put there — except messages, which stay zero
    (fb.valid invariant)."""
    fb = sg.fb
    m = fb.count
    t = fb.tdof
    z = fb.z.shape[-1]
    cat = lambda field: jnp.concatenate(
        [_cm2rm(field(fs), p.m) for p, fs in zip(sg.parts, state.f)]
    )[sg.inv_map]
    msg_mask = fb.valid[:, None]
    fstate = sweep_mod.FactorState(
        linpoint=cat(lambda fs: fs.lp),
        jac=cat(lambda fs: fs.jac).reshape(m, z, t),
        r0=cat(lambda fs: fs.r0),
        msg_eta=tuple(
            jnp.where(msg_mask, cat(lambda fs, k=k: fs.msg_eta[k]), 0.0)
            for k in range(2)),
        msg_lam=tuple(
            jnp.where(msg_mask, cat(lambda fs, k=k: fs.msg_lam[k]), 0.0)
            .reshape(m, d, d) for k, d in enumerate(fb.dofs)),
        since_relin=cat(lambda fs: fs.srel).reshape(m).astype(jnp.int32),
    )
    vstates = list(state.v)
    e_blk = fb.vblocks[fb.ell_slot]
    vs = vstates[e_blk]
    vstates[e_blk] = VariableState(
        eta=vs.eta[sg.vinv], lam=vs.lam[sg.vinv], mean=vs.mean[sg.vinv])
    return GBPState(v=tuple(vstates), f=(fstate,))


@jax.jit
def from_gbp_state_seg(sg: CMSegGraph, state: GBPState) -> CMState:
    fb = sg.fb
    m = fb.count
    fs = state.f[0]
    fstates = []
    for p in sg.parts:
        fstates.append(CMFactorState(
            lp=_seg_to_cm(p, fs.linpoint),
            jac=_seg_to_cm(p, fs.jac.reshape(m, -1)),
            r0=_seg_to_cm(p, fs.r0),
            srel=_seg_to_cm(p, fs.since_relin.astype(fs.r0.dtype)),
            msg_eta=tuple(_seg_to_cm(p, me) for me in fs.msg_eta),
            msg_lam=tuple(
                _seg_to_cm(p, ml.reshape(m, -1)) for ml in fs.msg_lam),
        ))
    vstates = list(state.v)
    e_blk = fb.vblocks[fb.ell_slot]
    vs = vstates[e_blk]
    vstates[e_blk] = VariableState(
        eta=vs.eta[sg.vperm], lam=vs.lam[sg.vperm], mean=vs.mean[sg.vperm])
    return CMState(v=tuple(vstates), f=tuple(fstates))


# --- public dispatchers: the seg types ride the same entry points ---------
_sweep_cm_single = sweep
_run_cm_single = run
_init_state_single = init_state
_to_gbp_state_single = to_gbp_state
_from_gbp_state_single = from_gbp_state


def sweep(cmg, state, cfg, active=None):  # noqa: F811
    if isinstance(cmg, CMSegGraph):
        assert active is None, "schedule masks: use the single-segment path"
        return sweep_seg(cmg, state, cfg)
    return _sweep_cm_single(cmg, state, cfg, active)


@f32_exact
def run(cmg, state, cfg: GBPConfig, n_iters: int):  # noqa: F811
    def body(_, s):
        return sweep(cmg, s, cfg)

    return jax.lax.fori_loop(0, n_iters, body, state)


def init_state(cmg, means):  # noqa: F811
    if isinstance(cmg, CMSegGraph):
        return init_state_seg(cmg, means)
    return _init_state_single(cmg, means)


def to_gbp_state(cmg, state):  # noqa: F811
    if isinstance(cmg, CMSegGraph):
        return to_gbp_state_seg(cmg, state)
    return _to_gbp_state_single(cmg, state)


def from_gbp_state(cmg, state):  # noqa: F811
    if isinstance(cmg, CMSegGraph):
        return from_gbp_state_seg(cmg, state)
    return _from_gbp_state_single(cmg, state)
