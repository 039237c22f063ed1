"""Halo-sharded SPMD GBP: owner-sharded beliefs, boundary-only collectives.

The first multi-chip path (parallel/spmd.py) replicates every variable belief
on every chip and all-reduces the FULL packed variable state each sweep —
collective volume and per-chip memory are O(all variables), so the mesh never
increases the solvable problem size.  This module implements the north-star
form [BASELINE.json: "partitioning keyframes/map blocks into subgraphs per
chip, exchanging boundary-variable messages via halo collectives"]:

  * variables are SHARDED by an owner chip (anchor block: contiguous ranges
    cut to balance factor counts; other blocks: majority vote of the factors
    touching them);
  * each chip holds only its owned beliefs plus read-only GHOST copies of the
    boundary variables its local factors touch but do not own;
  * per sweep, inside one `shard_map`:
      1. local factor math (same kernels as single-chip) over the local
         belief table = [owned | ghosts];
      2. local partial message sums over that table (segment_sum);
      3. ghost partials -> owners via ONE `all_gather` of the per-chip ghost
         buffer [n_ghost_max, d+d^2] — O(boundary), not O(all variables);
      4. owners update beliefs (prior + own partials + received partials);
      5. updated boundary beliefs -> ghost holders via ONE `all_gather` of
         the per-chip boundary buffer [b_max, 2d+d^2].
    No psum touches variable state; `psum` is reserved for convergence
    scalars (`energy_halo`).

Per-sweep collective bytes are therefore O(total boundary) (see
`collective_bytes`), and per-chip belief memory is O(n/P + boundary), so the
solvable problem grows with the mesh.  Reference analogue: none — the
reference is serial (SURVEY.md §2 'Parallelism & communication components');
the partition/halo design follows the IPU tile mapping of arXiv:2003.03134
§4.2 re-expressed as XLA collectives.
"""
from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gbp_tpu.core import sweep as sweep_mod
from gbp_tpu.core.graph import FactorBlock, Graph, VariableBlock
from gbp_tpu.core.sweep import (
    GBPConfig,
    GBPState,
    FactorState,
    VariableState,
    f32_exact,
)
from gbp_tpu.utils.smalllinalg import scaled_sym_solve


class HaloComm(flax.struct.PyTreeNode):
    """Per-variable-block halo wiring (all arrays stacked [P, ...]).

    Two interchangeable lowerings of the same exchange, chosen per block at
    partition time (`mode`):

    * "gather": one `all_gather` of the per-chip ghost/boundary buffer each
      direction.  Bytes/chip = P * buffer — right for dense connectivity
      (every chip needs most of the boundary anyway).
    * "permute": one `ppermute` per OWNER-DISTANCE OFFSET present in the
      partition (contiguous keyframe blocks put almost all ghosts on ring
      neighbors, so the offset set is tiny).  Bytes/chip = total boundary
      actually needed — the north-star "halo collectives" form.
    """

    # --- gather mode wiring ---
    # Ghost partials -> owner: flat index into the all-gathered ghost buffer
    # [P * n_ghost_max], target owned slot, and validity.
    recv_src: jnp.ndarray  # [P, r_max] int32
    recv_tgt: jnp.ndarray  # [P, r_max] int32
    recv_mask: jnp.ndarray  # [P, r_max] bool
    # Boundary beliefs -> ghost holders: which owned slots to export, and for
    # each ghost slot, the flat index into the all-gathered export [P * b_max].
    bnd_idx: jnp.ndarray  # [P, b_max] int32 owned slots to export
    ghost_src: jnp.ndarray  # [P, n_ghost_max] int32
    ghost_mask: jnp.ndarray  # [P, n_ghost_max] bool
    # --- permute mode wiring (None when mode == "gather") ---
    # Ghost partials -> owner, one hop per offset d: chip p sends its ghosts
    # owned by chip (p+d)%P.  Receiver adds at static owned slots (padded
    # entries target slot n_own_max and are dropped).
    send_idx: tuple | None = None  # per d: [P, s_d] int32 into ghost buffer
    send_mask: tuple | None = None  # per d: [P, s_d] bool
    cat_tgt: jnp.ndarray | None = None  # [P, sum_d s_d] int32
    # Owner beliefs -> ghost holders, one hop per offset e: owner o exports
    # boundary beliefs to chip (o+e)%P; each ghost slot reads one row of the
    # concatenated receive buffers.
    bsend_idx: tuple | None = None  # per e: [P, t_e] int32 owned slots
    perm_ghost_src: jnp.ndarray | None = None  # [P, n_ghost_max] into concat
    n_own_max: int = flax.struct.field(pytree_node=False, default=0)
    n_ghost_max: int = flax.struct.field(pytree_node=False, default=0)
    b_max: int = flax.struct.field(pytree_node=False, default=0)
    r_max: int = flax.struct.field(pytree_node=False, default=0)
    mode: str = flax.struct.field(pytree_node=False, default="gather")
    offsets_out: tuple = flax.struct.field(pytree_node=False, default=())
    offsets_in: tuple = flax.struct.field(pytree_node=False, default=())


class HaloGraph(flax.struct.PyTreeNode):
    """Static per-chip graph data, stacked on a leading chip axis [P, ...]."""

    vblocks: tuple  # VariableBlock per vblock, priors [P, n_own_max, ...]
    fblocks: tuple  # FactorBlock per fblock, arrays [P, m_loc, ...], LOCAL adj
    comm: tuple  # HaloComm per vblock


class HaloState(flax.struct.PyTreeNode):
    v: tuple  # owned VariableState per vblock [P, n_own_max, ...]
    ghost: tuple  # ghost VariableState per vblock [P, n_ghost_max, ...]
    f: tuple  # FactorState per fblock [P, m_loc, ...]


class HaloProblem:
    """Host-side partition result: the device pytree + numpy bookkeeping."""

    def __init__(self, hgraph, mesh_size, owned_ids, owned_valid, ghost_ids,
                 fb_src_rows, src_graph):
        self.hgraph = hgraph
        self.n_chips = mesh_size
        self.owned_ids = owned_ids  # per vblock [P, n_own_max] int64 (-1 pad)
        self.owned_valid = owned_valid  # per vblock [P, n_own_max] bool
        self.ghost_ids = ghost_ids  # per vblock [P, n_ghost_max] int64 (-1 pad)
        self.fb_src_rows = fb_src_rows  # per fblock [P, m_loc] int64 (-1 pad)
        self.src_graph = src_graph


# --------------------------------------------------------------------------
# Host-side partitioner
# --------------------------------------------------------------------------


def _balanced_cut(weights: np.ndarray, n_chips: int) -> np.ndarray:
    """Owner per index: contiguous ranges cutting the weight prefix into
    n_chips near-equal loads (VERDICT r1: balance by factor count, not by
    equal ID ranges)."""
    c = np.cumsum(weights, dtype=np.float64)
    total = c[-1] if c.size else 0.0
    if total <= 0:
        return (np.arange(weights.size) * n_chips) // max(weights.size, 1)
    # cut after the prefix crosses k/n of the total
    owner = np.minimum(
        (np.floor((c - weights / 2) * n_chips / total)).astype(np.int64),
        n_chips - 1,
    )
    return np.maximum.accumulate(owner)  # monotone => contiguous ranges


def partition(graph: Graph, n_chips: int, anchor_slot: int = 0,
              comm_mode: str = "auto", order_keys: dict | None = None
              ) -> HaloProblem:
    """Partition `graph` (plain row layout) into an owner-sharded HaloProblem.

    anchor_slot: the factor slot whose variable's owner the factor follows
    (cameras/keyframes for BA — the keyframe-block partition).
    comm_mode: "auto" picks per vblock between the all_gather exchange and
    the per-offset ppermute neighbor exchange by modelled bytes; "gather" /
    "permute" force one.
    order_keys: optional {vblock index: [count] key array} — each chip's
    owned/ghost slot assignment for that block follows ascending key
    instead of ascending global id.  Local slot numbering is free under
    halo (collect_means maps through owned_ids), so this is how the
    camera-window locality sort comes for FREE per chip: keying landmarks
    by their min adjacent camera makes consecutive per-chip ELL groups see
    nearby cameras (halo_cm window support) with zero per-sweep cost —
    unlike the single-chip path, which must relabel a user-visible block
    (core/sweep_cm.CMGraph.vperm)."""
    nvb = len(graph.vblocks)
    vcounts = [vb.count for vb in graph.vblocks]
    adjs = [[np.asarray(a) for a in fb.adj] for fb in graph.fblocks]

    # 1. Owners for anchor vblocks: degree-weighted balanced contiguous cut.
    owner_of = [None] * nvb
    anchor_vb = []
    for fi, fb in enumerate(graph.fblocks):
        s = min(anchor_slot, len(fb.vblocks) - 1)
        anchor_vb.append((fb.vblocks[s], s))
    for vbi, _ in anchor_vb:
        if owner_of[vbi] is not None:
            continue
        deg = np.zeros(vcounts[vbi], dtype=np.int64)
        for fi, (avb, s) in enumerate(anchor_vb):
            if avb == vbi:
                deg += np.bincount(adjs[fi][s], minlength=vcounts[vbi])
        owner_of[vbi] = _balanced_cut(deg + 1, n_chips)

    # 2. Factor owners follow their anchor variable's owner.
    fowner = []
    for fi, (avb, s) in enumerate(anchor_vb):
        fowner.append(owner_of[avb][adjs[fi][s]])

    # 3. Remaining vblocks: majority vote of the owning chips of their factors.
    for vbi in range(nvb):
        if owner_of[vbi] is not None:
            continue
        votes = np.zeros((vcounts[vbi], n_chips), dtype=np.int64)
        for fi, fb in enumerate(graph.fblocks):
            for k, tvb in enumerate(fb.vblocks):
                if tvb != vbi:
                    continue
                np.add.at(votes, (adjs[fi][k], fowner[fi]), 1)
        own = votes.argmax(axis=1)
        own[votes.sum(axis=1) == 0] = 0  # prior-only variables
        owner_of[vbi] = own

    # 4. Per-chip local universes: owned + ghosts, and local id maps.
    def by_key(vbi, ids):
        if order_keys is None or vbi not in order_keys:
            return ids
        return ids[np.argsort(np.asarray(order_keys[vbi])[ids],
                              kind="stable")]

    owned_lists = [[by_key(vbi, np.where(owner_of[vbi] == c)[0])
                    for c in range(n_chips)] for vbi in range(nvb)]
    ghost_sets = [[set() for _ in range(n_chips)] for _ in range(nvb)]
    for fi, fb in enumerate(graph.fblocks):
        for k, tvb in enumerate(fb.vblocks):
            ghosted = owner_of[tvb][adjs[fi][k]] != fowner[fi]
            for v, c in zip(adjs[fi][k][ghosted], fowner[fi][ghosted]):
                ghost_sets[tvb][int(c)].add(int(v))
    ghost_lists = [[by_key(vbi, np.array(sorted(s), dtype=np.int64))
                    for s in per_vb] for per_vb in ghost_sets]

    n_own_max = [max(max(len(o) for o in owned_lists[vbi]), 1)
                 for vbi in range(nvb)]
    n_ghost_max = [max(max(len(g) for g in ghost_lists[vbi]), 0)
                   for vbi in range(nvb)]

    # global id -> (owner, owned slot) and, per chip, global -> local slot.
    own_slot = [np.zeros(vcounts[vbi], dtype=np.int64) for vbi in range(nvb)]
    for vbi in range(nvb):
        for c in range(n_chips):
            own_slot[vbi][owned_lists[vbi][c]] = np.arange(
                len(owned_lists[vbi][c]))
    # Per (vblock, chip) ghost lookup: global id -> ghost slot (-1 if none).
    ghost_lookup = []
    for vbi in range(nvb):
        gl = np.full((n_chips, vcounts[vbi]), -1, dtype=np.int64)
        for c in range(n_chips):
            ids = ghost_lists[vbi][c]
            gl[c, ids] = np.arange(ids.size)
        ghost_lookup.append(gl)

    # 5. Local factor blocks (chip-stacked, local adjacency).
    m_locs = [max(int(np.bincount(fo, minlength=n_chips).max()), 1)
              for fo in fowner]
    new_fblocks = []
    fb_src_rows = []
    for fi, fb in enumerate(graph.fblocks):
        m_loc = m_locs[fi]
        rows = np.full((n_chips, m_loc), -1, dtype=np.int64)
        for c in range(n_chips):
            mine = np.where(fowner[fi] == c)[0]
            rows[c, : mine.size] = mine
        fb_src_rows.append(rows)
        safe = np.maximum(rows, 0)

        def place(a):
            a = np.asarray(a)
            out = a[safe.reshape(-1)].reshape((n_chips, m_loc) + a.shape[1:])
            return out

        ladj = []
        chipcol = np.arange(n_chips)[:, None]
        for k, tvb in enumerate(fb.vblocks):
            gadj = np.asarray(fb.adj[k])[safe]  # [P, m_loc] global ids
            loc = np.where(
                owner_of[tvb][gadj] == chipcol,
                own_slot[tvb][gadj],
                n_own_max[tvb] + ghost_lookup[tvb][chipcol, gadj],
            )
            loc[rows < 0] = 0
            ladj.append(jnp.asarray(loc.astype(np.int32)))

        valid = rows >= 0
        if fb.valid is not None:
            valid = valid & np.asarray(fb.valid)[safe]
        new_fblocks.append(fb.replace(
            adj=tuple(ladj),
            z=jnp.asarray(place(fb.z)),
            prec=jnp.asarray(place(fb.prec)),
            args=None if fb.args is None else jax.tree_util.tree_map(
                lambda a: jnp.asarray(place(a)), fb.args),
            huber_arr=None if fb.huber_arr is None
            else jnp.asarray(place(fb.huber_arr)),
            valid=jnp.asarray(valid),
            n_valid=int(valid.sum()),
            ell_slot=None,
            ell_deg=0,
        ))

    # 6. Owned priors (padded slots: eta 0, lam I so solves stay finite).
    new_vblocks = []
    owned_ids_np, owned_valid_np, ghost_ids_np = [], [], []
    for vbi, vb in enumerate(graph.vblocks):
        d = vb.dof
        no = n_own_max[vbi]
        pe = np.zeros((n_chips, no, d))
        pl = np.tile(np.eye(d), (n_chips, no, 1, 1))
        ids = np.full((n_chips, no), -1, dtype=np.int64)
        val = np.zeros((n_chips, no), dtype=bool)
        src_pe = np.asarray(vb.prior_eta)
        src_pl = np.asarray(vb.prior_lam)
        for c in range(n_chips):
            o = owned_lists[vbi][c]
            pe[c, : o.size] = src_pe[o]
            pl[c, : o.size] = src_pl[o]
            ids[c, : o.size] = o
            val[c, : o.size] = True
        new_vblocks.append(VariableBlock(
            prior_eta=jnp.asarray(pe, dtype=vb.prior_eta.dtype),
            prior_lam=jnp.asarray(pl, dtype=vb.prior_lam.dtype),
            name=vb.name,
        ))
        owned_ids_np.append(ids)
        owned_valid_np.append(val)
        gids = np.full((n_chips, max(n_ghost_max[vbi], 0)), -1, dtype=np.int64)
        for c in range(n_chips):
            g = ghost_lists[vbi][c]
            gids[c, : g.size] = g
        ghost_ids_np.append(gids)

    # 7. Comm wiring.
    comms = []
    for vbi in range(nvb):
        ng = n_ghost_max[vbi]
        # boundary = owned vars ghosted anywhere
        bnd_per_chip = [[] for _ in range(n_chips)]
        ghosted_by = {}  # global id -> position in owner's bnd list
        for c in range(n_chips):
            for v in ghost_lists[vbi][c]:
                v = int(v)
                if v not in ghosted_by:
                    o = int(owner_of[vbi][v])
                    ghosted_by[v] = (o, len(bnd_per_chip[o]))
                    bnd_per_chip[o].append(v)
        b_max = max(max((len(b) for b in bnd_per_chip), default=0), 0)
        # receives: for owner chip c, contributions from every chip p's ghosts
        recv = [[] for _ in range(n_chips)]
        for p in range(n_chips):
            for j, v in enumerate(ghost_lists[vbi][p]):
                o = int(owner_of[vbi][int(v)])
                recv[o].append((p * ng + j, int(own_slot[vbi][int(v)])))
        r_max = max(max((len(r) for r in recv), default=0), 0)

        recv_src = np.zeros((n_chips, max(r_max, 1)), dtype=np.int32)
        recv_tgt = np.zeros((n_chips, max(r_max, 1)), dtype=np.int32)
        recv_mask = np.zeros((n_chips, max(r_max, 1)), dtype=bool)
        for c in range(n_chips):
            for j, (s, t) in enumerate(recv[c]):
                recv_src[c, j], recv_tgt[c, j], recv_mask[c, j] = s, t, True
        bnd_idx = np.zeros((n_chips, max(b_max, 1)), dtype=np.int32)
        for c in range(n_chips):
            for j, v in enumerate(bnd_per_chip[c]):
                bnd_idx[c, j] = own_slot[vbi][v]
        ghost_src = np.zeros((n_chips, max(ng, 1)), dtype=np.int32)
        ghost_mask = np.zeros((n_chips, max(ng, 1)), dtype=bool)
        for c in range(n_chips):
            for j, v in enumerate(ghost_lists[vbi][c]):
                o, pos = ghosted_by[int(v)]
                ghost_src[c, j] = o * max(b_max, 1) + pos
                ghost_mask[c, j] = True

        # permute-mode wiring: one hop per owner-distance offset.
        gowner = [owner_of[vbi][ghost_lists[vbi][p]] for p in range(n_chips)]
        offs_out = sorted({int((o - p) % n_chips)
                           for p in range(n_chips) for o in gowner[p]})
        send_idx, send_mask, s_sizes = [], [], []
        for d in offs_out:
            per_p = [np.flatnonzero(gowner[p] == (p + d) % n_chips)
                     for p in range(n_chips)]
            s_d = max(max((len(x) for x in per_p), default=0), 1)
            si = np.zeros((n_chips, s_d), dtype=np.int32)
            sm = np.zeros((n_chips, s_d), dtype=bool)
            for p in range(n_chips):
                si[p, : per_p[p].size] = per_p[p]
                sm[p, : per_p[p].size] = True
            send_idx.append(jnp.asarray(si))
            send_mask.append(jnp.asarray(sm))
            s_sizes.append(s_d)
        cat_tgt = np.full((n_chips, max(sum(s_sizes), 1)), n_own_max[vbi],
                          dtype=np.int32)
        col = 0
        for d, s_d in zip(offs_out, s_sizes):
            for c in range(n_chips):
                p = (c - d) % n_chips
                vs = ghost_lists[vbi][p][gowner[p] == c]
                cat_tgt[c, col : col + vs.size] = own_slot[vbi][vs]
            col += s_d
        offs_in = sorted({int((p - o) % n_chips)
                          for p in range(n_chips) for o in gowner[p]})
        bsend_idx, t_sizes = [], []
        for e in offs_in:
            per_o = [ghost_lists[vbi][(o + e) % n_chips][
                gowner[(o + e) % n_chips] == o] for o in range(n_chips)]
            t_e = max(max((len(x) for x in per_o), default=0), 1)
            bi = np.zeros((n_chips, t_e), dtype=np.int32)
            for o in range(n_chips):
                bi[o, : per_o[o].size] = own_slot[vbi][per_o[o]]
            bsend_idx.append(jnp.asarray(bi))
            t_sizes.append(t_e)
        perm_ghost_src = np.zeros((n_chips, max(ng, 1)), dtype=np.int32)
        base = {e: int(np.sum(t_sizes[:i])) for i, e in enumerate(offs_in)}
        for p in range(n_chips):
            for o in set(int(x) for x in gowner[p]):
                e = (p - o) % n_chips
                sel = np.flatnonzero(gowner[p] == o)
                perm_ghost_src[p, sel] = base[e] + np.arange(sel.size)

        gather_vol = n_chips * (ng + b_max)
        permute_vol = sum(s_sizes) + sum(t_sizes)
        if comm_mode == "auto":
            mode = "permute" if (ng > 0 and permute_vol < gather_vol) else "gather"
        else:
            mode = comm_mode if ng > 0 else "gather"
        comms.append(HaloComm(
            recv_src=jnp.asarray(recv_src), recv_tgt=jnp.asarray(recv_tgt),
            recv_mask=jnp.asarray(recv_mask), bnd_idx=jnp.asarray(bnd_idx),
            ghost_src=jnp.asarray(ghost_src), ghost_mask=jnp.asarray(ghost_mask),
            send_idx=tuple(send_idx) if mode == "permute" else None,
            send_mask=tuple(send_mask) if mode == "permute" else None,
            cat_tgt=jnp.asarray(cat_tgt) if mode == "permute" else None,
            bsend_idx=tuple(bsend_idx) if mode == "permute" else None,
            perm_ghost_src=(jnp.asarray(perm_ghost_src)
                            if mode == "permute" else None),
            n_own_max=n_own_max[vbi], n_ghost_max=ng, b_max=b_max,
            r_max=r_max, mode=mode,
            offsets_out=tuple(offs_out) if mode == "permute" else (),
            offsets_in=tuple(offs_in) if mode == "permute" else (),
        ))

    hgraph = HaloGraph(vblocks=tuple(new_vblocks), fblocks=tuple(new_fblocks),
                       comm=tuple(comms))
    return HaloProblem(hgraph, n_chips, owned_ids_np, owned_valid_np,
                       ghost_ids_np, fb_src_rows, graph)


# --------------------------------------------------------------------------
# State init / collection (host-side helpers)
# --------------------------------------------------------------------------


def init_state(hp: HaloProblem, means: tuple) -> HaloState:
    """Beliefs = priors (owned AND ghost copies), factors linearized at
    `means`, zero messages — identical semantics to sweep.init_state."""
    g = hp.src_graph
    P_ = hp.n_chips
    vstates, gstates = [], []
    for vbi, vb in enumerate(g.vblocks):
        d = vb.dof
        hvb = hp.hgraph.vblocks[vbi]
        mu = np.asarray(means[vbi])
        ids = hp.owned_ids[vbi]
        m0 = np.zeros((P_, ids.shape[1], d), dtype=mu.dtype)
        m0[hp.owned_valid[vbi]] = mu[ids[hp.owned_valid[vbi]]]
        vstates.append(VariableState(
            eta=hvb.prior_eta, lam=hvb.prior_lam,
            mean=jnp.asarray(m0, dtype=hvb.prior_eta.dtype)))
        ng = hp.hgraph.comm[vbi].n_ghost_max
        ge = np.zeros((P_, max(ng, 1), d))
        gl = np.tile(np.eye(d), (P_, max(ng, 1), 1, 1))
        gm = np.zeros((P_, max(ng, 1), d))
        pe, pl = np.asarray(vb.prior_eta), np.asarray(vb.prior_lam)
        gids = hp.ghost_ids[vbi]
        for c in range(P_):
            sel = gids[c] >= 0
            ge[c, : sel.sum()] = pe[gids[c][sel]]
            gl[c, : sel.sum()] = pl[gids[c][sel]]
            gm[c, : sel.sum()] = mu[gids[c][sel]]
        dt = hvb.prior_eta.dtype
        gstates.append(VariableState(
            eta=jnp.asarray(ge, dt), lam=jnp.asarray(gl, dt),
            mean=jnp.asarray(gm, dt)))

    fstates = []
    for fi, fb in enumerate(g.fblocks):
        hfb = hp.hgraph.fblocks[fi]
        rows = hp.fb_src_rows[fi]
        safe = np.maximum(rows, 0)
        x = np.concatenate(
            [np.asarray(means[vb])[np.asarray(fb.adj[k])[safe]]
             for k, vb in enumerate(fb.vblocks)], axis=-1)
        P2, m_loc, t = x.shape
        xj = jnp.asarray(x.reshape(P2 * m_loc, t), dtype=hfb.z.dtype)
        flat_fb = fb.replace(
            z=hfb.z.reshape(P2 * m_loc, -1),
            prec=hfb.prec.reshape((P2 * m_loc,) + hfb.prec.shape[2:]),
            args=None if hfb.args is None else jax.tree_util.tree_map(
                lambda a: a.reshape((P2 * m_loc,) + a.shape[2:]), hfb.args),
        )
        jac, r0 = sweep_mod.linearize_block(flat_fb, xj)
        dt = jac.dtype
        z = r0.shape[-1]
        fstates.append(FactorState(
            linpoint=xj.reshape(P2, m_loc, t),
            jac=jac.reshape(P2, m_loc, z, t),
            r0=r0.reshape(P2, m_loc, z),
            msg_eta=tuple(jnp.zeros((P2, m_loc, d), dt) for d in fb.dofs),
            msg_lam=tuple(jnp.zeros((P2, m_loc, d, d), dt) for d in fb.dofs),
            since_relin=jnp.zeros((P2, m_loc), jnp.int32),
        ))
    return HaloState(v=tuple(vstates), ghost=tuple(gstates), f=tuple(fstates))


def weaken_priors(hp: HaloProblem, factor: float = 0.1,
                  keep=((0, (0, 1), (0, 6)),)) -> HaloProblem:
    """Owner-sharded analogue of models/ba.weaken_priors: scale every owned
    variable's prior by `factor` except the listed gauge anchors (global
    indices).  keep entries are (vblock, ids) or (vblock, ids, (lo, hi))
    pinning only that component range (the default pins components 0..6 —
    whole state for 6-dof cameras, pose-only for 9-dof intrinsics cameras).
    Padded owned slots keep their identity prior."""
    hg = hp.hgraph
    new_vbs = []
    for vbi, vb in enumerate(hg.vblocks):
        dof = vb.prior_eta.shape[-1]
        scale = np.full(hp.owned_ids[vbi].shape + (dof,), factor)
        scale[~hp.owned_valid[vbi]] = 1.0
        for e in keep:
            kvb, idxs = e[0], e[1]
            if kvb != vbi:
                continue
            lo, hi = (0, dof) if len(e) < 3 else e[2]
            for gid in np.asarray(idxs).ravel():
                hits = np.argwhere(hp.owned_ids[vbi] == gid)
                if hits.size:
                    scale[hits[0][0], hits[0][1], lo:min(hi, dof)] = 1.0
        sc = jnp.asarray(scale, dtype=vb.prior_eta.dtype)
        new_vbs.append(vb.replace(prior_eta=vb.prior_eta * sc,
                                  prior_lam=vb.prior_lam * sc[..., None]))
    hp.hgraph = hg.replace(vblocks=tuple(new_vbs))
    return hp


def collect_means(hp: HaloProblem, state: HaloState) -> tuple:
    """Owned per-chip means -> global [n, d] arrays (host-side)."""
    out = []
    for vbi, vb in enumerate(hp.src_graph.vblocks):
        m = np.asarray(jax.device_get(state.v[vbi].mean))
        ids, val = hp.owned_ids[vbi], hp.owned_valid[vbi]
        g = np.zeros((vb.count, vb.dof), dtype=m.dtype)
        g[ids[val]] = m[val]
        out.append(g)
    return tuple(out)


def collective_bytes(hp: HaloProblem, itemsize: int = 4) -> dict:
    """Analytic per-sweep collective volume (bytes moved per chip).

    halo: the two all_gathers (ghost partials + boundary beliefs).
    replicated_psum: what parallel/spmd.py moves (full packed variable state,
    all-reduced) — the number the halo path must beat at scale."""
    P_ = hp.n_chips
    halo = 0
    rep = 0
    modes = []
    for vbi, vb in enumerate(hp.src_graph.vblocks):
        d = vb.dof
        c = hp.hgraph.comm[vbi]
        modes.append(c.mode)
        if c.mode == "permute":
            s_out = sum(int(si.shape[1]) for si in c.send_idx)
            s_in = sum(int(bi.shape[1]) for bi in c.bsend_idx)
            halo += s_out * (d + d * d) * itemsize
            halo += s_in * (2 * d + d * d) * itemsize
        else:
            halo += P_ * c.n_ghost_max * (d + d * d) * itemsize
            halo += P_ * c.b_max * (2 * d + d * d) * itemsize
        rep += 2 * vb.count * (d + d * d) * itemsize  # ring all-reduce ~2x
    return {"halo_bytes_per_sweep": int(halo),
            "replicated_psum_bytes_per_sweep": int(rep),
            "modes": modes}


# --------------------------------------------------------------------------
# The shard_map sweep
# --------------------------------------------------------------------------


def _unstack(tree):
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def _restack(tree):
    return jax.tree_util.tree_map(lambda a: a[None], tree)


def _local_graph(hg: HaloGraph) -> Graph:
    """A per-chip Graph view whose belief table is [owned | ghosts].

    vblock priors are only a shape carrier here (belief updates are done by
    the halo exchange, not update_beliefs)."""
    vbs = []
    for vbi, vb in enumerate(hg.vblocks):
        c = hg.comm[vbi]
        d = vb.prior_eta.shape[-1]
        n_loc = c.n_own_max + max(c.n_ghost_max, 1)
        vbs.append(VariableBlock(
            prior_eta=jnp.zeros((n_loc, d), vb.prior_eta.dtype),
            prior_lam=jnp.zeros((n_loc, d, d), vb.prior_lam.dtype),
            name=vb.name))
    return Graph(vblocks=tuple(vbs), fblocks=hg.fblocks, inboxes=None)


def _sweep_halo(hg: HaloGraph, state: HaloState, cfg: GBPConfig,
                axis: str, active: tuple | None = None,
                skip_exchange: bool = False) -> HaloState:
    """One synchronous sweep on a chip's shard (runs inside shard_map).

    active: optional per-fblock [m_loc] bool mask (chip-local rows) for the
    wildfire/priority/random halo schedules (parallel/schedules.py);
    inactive factors keep their previous messages and skip relinearization —
    identical composition with the validity mask as the single-chip
    sweep(..., active=...)."""
    # Local belief table per vblock: [owned | ghosts].
    lv = tuple(
        VariableState(
            eta=jnp.concatenate([state.v[i].eta, state.ghost[i].eta]),
            lam=jnp.concatenate([state.v[i].lam, state.ghost[i].lam]),
            mean=jnp.concatenate([state.v[i].mean, state.ghost[i].mean]),
        )
        for i in range(len(state.v))
    )
    lgraph = _local_graph(hg)
    lstate = GBPState(v=lv, f=state.f)

    # Factor stage: identical kernels/decisions as the single-chip sweep.
    new_f = []
    for fi, fb in enumerate(hg.fblocks):
        fs = lstate.f[fi]
        act = fb.valid
        if active is not None:
            act = active[fi] if act is None else act & active[fi]
        beliefs, x = sweep_mod._gather_beliefs_and_means(lgraph, lstate, fi)
        if sweep_mod._use_fused_relin(cfg, fb):
            fs = sweep_mod._fused_relin_messages(fb, fs, beliefs, x, cfg, act)
        else:
            fs = sweep_mod._relinearize(fb, fs, x, cfg, act)
            fs = sweep_mod._compute_messages(fb, fs, beliefs, cfg, act)
        new_f.append(fs)

    # Belief stage: local partial sums + the two boundary collectives.
    new_v, new_ghost = [], []
    for vbi, vb in enumerate(hg.vblocks):
        c = hg.comm[vbi]
        d = vb.prior_eta.shape[-1]
        n_loc = c.n_own_max + max(c.n_ghost_max, 1)
        packed = jnp.zeros((n_loc, d + d * d), vb.prior_eta.dtype)
        for fi, fb in enumerate(hg.fblocks):
            for k, tvb in enumerate(fb.vblocks):
                if tvb != vbi:
                    continue
                packed = packed + jax.ops.segment_sum(
                    sweep_mod._pack_msgs(new_f[fi], k), fb.adj[k],
                    num_segments=n_loc)
        ov, gv = exchange_and_update(vb, c, packed, state.ghost[vbi], axis,
                                     skip=skip_exchange)
        new_v.append(ov)
        new_ghost.append(gv)
    return HaloState(v=tuple(new_v), ghost=tuple(new_ghost), f=tuple(new_f))


def exchange_and_update(vb, c: HaloComm, packed: jnp.ndarray, ghost_prev,
                        axis: str, skip: bool = False):
    """The halo exchange + owner belief update for one variable block.

    packed: [n_own_max + max(ng, 1), d + d^2] local partial message sums
    (rows beyond n_own_max are the ghost partials).  Runs inside shard_map.
    Returns (owned VariableState, ghost VariableState).

    skip=True (static) drops BOTH collectives — owners update from local
    partials only and ghosts go stale.  Wrong numerics, identical local
    data movement: the bench baseline that isolates pure communication
    overhead on ANY platform (gbp_tpu/bench/scaling.py
    collective_overhead_efficiency)."""
    d = vb.prior_eta.shape[-1]
    no, ng = c.n_own_max, c.n_ghost_max
    own_part = packed[:no]
    n_dev = jax.lax.axis_size(axis)
    if ng > 0 and not skip:
        # ghost partials -> owners (O(boundary) collective #1)
        gbuf = packed[no : no + ng]
        if c.mode == "permute":
            recvs = []
            for i, off in enumerate(c.offsets_out):
                buf = jnp.where(c.send_mask[i][:, None],
                                gbuf[c.send_idx[i]], 0.0)
                perm = [(p, (p + off) % n_dev) for p in range(n_dev)]
                recvs.append(jax.lax.ppermute(buf, axis, perm))
            contrib = jnp.concatenate(recvs, axis=0)
            # padded entries target slot `no` and fall off the end
            own_part = own_part + jax.ops.segment_sum(
                contrib, c.cat_tgt, num_segments=no + 1)[:no]
        else:
            gathered = jax.lax.all_gather(gbuf, axis)
            flat = gathered.reshape(-1, d + d * d)
            contrib = jnp.where(c.recv_mask[:, None], flat[c.recv_src], 0.0)
            own_part = own_part + jax.ops.segment_sum(
                contrib, c.recv_tgt, num_segments=no)
    eta = vb.prior_eta + own_part[:, :d]
    lam = vb.prior_lam + own_part[:, d:].reshape(no, d, d)
    mean = scaled_sym_solve(lam, eta)
    owned = VariableState(eta=eta, lam=lam, mean=mean)
    if ng == 0 or skip:
        return owned, ghost_prev
    # boundary beliefs -> ghost holders (O(boundary) collective #2)
    pk = jnp.concatenate([eta, lam.reshape(no, -1), mean], axis=1)
    if c.mode == "permute":
        recvs = []
        for i, off in enumerate(c.offsets_in):
            buf = pk[c.bsend_idx[i]]  # [t_e, 2d+d^2]
            perm = [(p, (p + off) % n_dev) for p in range(n_dev)]
            recvs.append(jax.lax.ppermute(buf, axis, perm))
        got = jnp.concatenate(recvs, axis=0)[c.perm_ghost_src]
    else:
        exp = pk[c.bnd_idx]  # [b_max, 2d+d^2]
        allb = jax.lax.all_gather(exp, axis).reshape(-1, 2 * d + d * d)
        got = allb[c.ghost_src]
    from gbp_tpu.gaussians import packed_identity_row

    idrow = packed_identity_row(d, pk.dtype)
    got = jnp.where(c.ghost_mask[:, None], got, idrow[None, :])
    ghost = VariableState(
        eta=got[:, :d],
        lam=got[:, d : d + d * d].reshape(ng, d, d),
        mean=got[:, -d:])
    return owned, ghost


def shard_leading(tree, axis: str):
    """PartitionSpec pytree: every leaf sharded on its leading chip axis."""
    return jax.tree_util.tree_map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), tree)


def _specs(hp: HaloProblem, state: HaloState, axis: str):
    return shard_leading(hp.hgraph, axis), shard_leading(state, axis)


def make_run(mesh: Mesh, hp: HaloProblem, state: HaloState,
             axis: str = "graph", skip_exchange: bool = False):
    """Compile run(hgraph, state, cfg, n_iters) over the mesh.

    skip_exchange=True drops the collectives each sweep (wrong numerics,
    identical local data movement) — the no-communication baseline of
    gbp_tpu/bench/scaling.py's collective_overhead_efficiency."""
    gspec, sspec = _specs(hp, state, axis)

    @functools.partial(jax.jit, static_argnums=3)
    def run_halo(hgraph, state, cfg, n_iters):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(gspec, sspec, P()),
            out_specs=sspec,
            check_vma=False,
        )
        @f32_exact
        def body(hgraph, state, cfg):
            hg, st = _unstack(hgraph), _unstack(state)

            def one(_, s):
                return _sweep_halo(hg, s, cfg, axis,
                                   skip_exchange=skip_exchange)

            return _restack(jax.lax.fori_loop(0, n_iters, one, st))

        return body(hgraph, state, cfg)

    return run_halo


def distribute(graph: Graph, means: tuple, mesh: Mesh, anchor_slot: int = 0,
               comm_mode: str = "auto"):
    """Partition + place: returns (HaloProblem, HaloState, run_fn).

    Factor data and owned/ghost beliefs are sharded chip-major on the mesh
    axis; nothing is replicated except GBPConfig scalars.  comm_mode picks
    the exchange lowering (see partition)."""
    axis = mesh.axis_names[0]
    hp = partition(graph, mesh.devices.size, anchor_slot, comm_mode)
    state = init_state(hp, means)
    gspec, sspec = _specs(hp, state, axis)

    def put(x, s):
        return jax.device_put(x, NamedSharding(mesh, s))

    hp.hgraph = jax.tree_util.tree_map(put, hp.hgraph, gspec)
    state = jax.tree_util.tree_map(put, state, sspec)
    return hp, state, make_run(mesh, hp, state, axis)


@f32_exact
def energy_halo(hp: HaloProblem, state: HaloState, mesh: Mesh,
                axis: str = "graph") -> float:
    """Total energy via per-chip partial sums + one psum scalar (the only
    psum in this module — convergence scalars, per the north-star split)."""
    hg = hp.hgraph

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_specs(hp, state, axis)),
        out_specs=P(),
        check_vma=False,
    )
    def chip_energy(hgraph, state):
        hgl, st = _unstack(hgraph), _unstack(state)
        lv = tuple(
            VariableState(
                eta=jnp.concatenate([st.v[i].eta, st.ghost[i].eta]),
                lam=jnp.concatenate([st.v[i].lam, st.ghost[i].lam]),
                mean=jnp.concatenate([st.v[i].mean, st.ghost[i].mean]),
            )
            for i in range(len(st.v))
        )
        lgraph = _local_graph(hgl)
        e = jnp.zeros((), lv[0].eta.dtype)
        for fi, fb in enumerate(lgraph.fblocks):
            x = sweep_mod.gather_linpoint(lgraph, GBPState(v=lv, f=st.f), fi)
            h = sweep_mod._vmap_factor(fb.ftype.meas, x, fb.args)
            r = jax.vmap(fb.ftype.residual)(fb.z, h)
            m2 = sweep_mod._mahalanobis_sq(fb.prec, r)
            if fb.huber is not None or fb.huber_arr is not None:
                t = (fb.huber_arr.astype(m2.dtype)
                     if fb.huber_arr is not None
                     else jnp.asarray(fb.huber, m2.dtype))
                mm = jnp.sqrt(jnp.maximum(m2, 1e-12))
                cost = jnp.where((mm > t) & (t > 0), t * (2 * mm - t), m2)
            else:
                cost = m2
            if fb.valid is not None:
                cost = jnp.where(fb.valid, cost, 0.0)
            e = e + 0.5 * jnp.sum(cost)
        return jax.lax.psum(e, axis)

    return float(chip_energy(hg, state))
