"""Explicit SPMD GBP: shard_map sweeps with halo collectives.

The GSPMD path (gbp_tpu/parallel/sharding.py) lets the XLA partitioner infer
collectives from sharding annotations.  This module is the explicit form from
the north-star spec [BASELINE.json: "partitioning keyframes/map blocks into
subgraphs per chip, exchanging boundary-variable messages via halo
collectives"]:

  * factors are PARTITIONED by the variable their anchor slot connects to
    (cameras for BA, pose index for pose graphs) — a keyframe-block partition;
    each chip's share is padded to a common size with inert dummies;
  * variable beliefs are replicated; each sweep every chip runs the factor
    math on its local factors only (relinearize -> Huber -> messages via the
    same kernels as single-chip, including the fused Pallas path), computes
    PARTIAL per-variable message sums with its LOCAL dense inbox (gather +
    reduce — no scatter on the hot path), and the partials are combined with
    one `jax.lax.psum` over the mesh axis — the halo exchange in all-reduce
    form (a variable touched by one chip contributes zeros elsewhere).
    Collective volume is O(total variable state) and beliefs are replicated,
    so this path does NOT scale memory with the mesh — parallel/halo.py is
    the owner-sharded path with boundary-only ppermute/all_gather exchange;
    this simpler form remains for small graphs and as a reference
    implementation.

Everything runs inside one jitted `shard_map`, so XLA overlaps the factor
math with the ICI all-reduce where possible.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gbp_tpu.core import sweep as sweep_mod
from gbp_tpu.core.graph import FactorBlock, Graph, Inbox, VariableBlock, build_inboxes
from gbp_tpu.core.sweep import GBPConfig, GBPState, VariableState, f32_exact


def partition_graph(graph: Graph, n_chips: int, anchor_slot: int = 0):
    """Host-side keyframe-block partition of every factor block.

    Factors go to the chip owning their anchor-slot variable (contiguous
    variable ranges — cameras/keyframes are temporally ordered, so this is
    the keyframe-block partition of the north star).  Returns a new Graph
    whose factor arrays are ordered chip-major ([P * M_loc] rows, inert
    dummies padding each chip to M_loc) plus per-chip local inboxes stacked
    as [P * n, deg].
    """
    new_fblocks = []
    local_inboxes_per_fb = []
    for fb in graph.fblocks:
        slot = min(anchor_slot, len(fb.vblocks) - 1)
        n_anchor = graph.vblocks[fb.vblocks[slot]].count
        adj = np.asarray(fb.adj[slot])
        chip = (adj.astype(np.int64) * n_chips) // n_anchor
        order = np.argsort(chip, kind="stable")
        counts = np.bincount(chip, minlength=n_chips)
        m_loc = max(int(counts.max()), 1)

        def place(a, fill=0):
            a = np.asarray(a)
            out = np.full((n_chips * m_loc,) + a.shape[1:], fill, dtype=a.dtype)
            starts = np.concatenate([[0], np.cumsum(counts)])
            for c in range(n_chips):
                rows = order[starts[c] : starts[c + 1]]
                out[c * m_loc : c * m_loc + rows.size] = a[rows]
            return out

        valid = np.zeros(n_chips * m_loc, dtype=bool)
        starts = np.concatenate([[0], np.cumsum(counts)])
        for c in range(n_chips):
            valid[c * m_loc : c * m_loc + int(counts[c])] = True
        n_valid = (
            int(valid.sum()) if fb.valid is None
            else int((place(np.asarray(fb.valid), fill=False) & valid).sum())
        )

        fb_new = fb.replace(
            n_valid=n_valid,
            ell_slot=None,  # chip-major reorder breaks the ELL row grouping
            ell_deg=0,
            adj=tuple(jnp.asarray(place(a)) for a in fb.adj),
            z=jnp.asarray(place(fb.z)),
            prec=jnp.asarray(place(fb.prec, fill=1)),
            args=None if fb.args is None else jax.tree_util.tree_map(
                lambda a: jnp.asarray(place(a)), fb.args
            ),
            huber_arr=None if fb.huber_arr is None
            else jnp.asarray(place(fb.huber_arr)),
            valid=jnp.asarray(valid)
            if fb.valid is None
            else jnp.asarray(place(fb.valid, fill=False) & valid),
        )
        new_fblocks.append(fb_new)

    # Per-chip local inboxes (local factor row coords), stacked over chips.
    vcounts = [vb.count for vb in graph.vblocks]
    stacked_inboxes = []
    for vi, n in enumerate(vcounts):
        per_chip = []
        for c in range(n_chips):
            chip_fblocks = []
            for fb in new_fblocks:
                m_loc = fb.count // n_chips
                chip_fblocks.append(
                    fb.replace(
                        adj=tuple(a[c * m_loc : (c + 1) * m_loc] for a in fb.adj),
                        z=fb.z[c * m_loc : (c + 1) * m_loc],
                    )
                )
            per_chip.append(build_inboxes(chip_fblocks, vcounts))
        if any(pc is None or pc[vi] is None for pc in per_chip):
            stacked_inboxes.append(None)
            continue
        # Pad every chip's inbox for (fi, slot) to a common max_deg, stack.
        specs0 = per_chip[0][vi]
        stacked = []
        for k, s0 in enumerate(specs0):
            deg = max(pc[vi][k].idx.shape[1] for pc in per_chip)
            idxs, masks = [], []
            for pc in per_chip:
                s = pc[vi][k]
                pad = deg - s.idx.shape[1]
                idxs.append(jnp.pad(s.idx, ((0, 0), (0, pad))))
                masks.append(jnp.pad(s.mask, ((0, 0), (0, pad))))
            stacked.append(
                Inbox(idx=jnp.concatenate(idxs, 0), mask=jnp.concatenate(masks, 0),
                      fi=s0.fi, slot=s0.slot)
            )
        stacked_inboxes.append(tuple(stacked))
    inboxes = None if all(s is None for s in stacked_inboxes) else tuple(stacked_inboxes)
    return graph.replace(fblocks=tuple(new_fblocks), inboxes=inboxes)


def _graph_pspec(graph: Graph, axis: str) -> Graph:
    """PartitionSpec pytree: factor arrays (and stacked inboxes) sharded on
    their leading chip-major axis, variable blocks replicated."""

    def sh(a):
        return P(axis, *([None] * (a.ndim - 1)))

    rep = jax.tree_util.tree_map(lambda a: P(), graph.vblocks)
    fbs = jax.tree_util.tree_map(sh, graph.fblocks)
    inb = None if graph.inboxes is None else jax.tree_util.tree_map(sh, graph.inboxes)
    return Graph(vblocks=rep, fblocks=fbs, inboxes=inb)


def _state_pspec(state: GBPState, axis: str) -> GBPState:
    def sh(a):
        return P(axis, *([None] * (a.ndim - 1)))

    return GBPState(
        v=jax.tree_util.tree_map(lambda a: P(), state.v),
        f=jax.tree_util.tree_map(sh, state.f),
    )


@f32_exact
def _update_beliefs_local(graph: Graph, state: GBPState, axis: str) -> GBPState:
    """Partial message sums from local factors (dense inbox or segment_sum),
    psum over the mesh, then the belief solve (identical on every chip)."""
    new_v = []
    for vi, vb in enumerate(graph.vblocks):
        d = vb.dof
        packed = jnp.zeros((vb.count, d + d * d), vb.prior_eta.dtype)
        specs = None if graph.inboxes is None else graph.inboxes[vi]
        if specs is not None:
            for spec in specs:
                mp = sweep_mod._pack_msgs(state.f[spec.fi], spec.slot)
                g = mp[spec.idx]
                packed = packed + jnp.sum(
                    jnp.where(spec.mask[:, :, None], g, 0.0), axis=1
                )
        else:
            for fi, fb in enumerate(graph.fblocks):
                for k, target in enumerate(fb.vblocks):
                    if target != vi:
                        continue
                    packed = packed + jax.ops.segment_sum(
                        sweep_mod._pack_msgs(state.f[fi], k), fb.adj[k],
                        num_segments=vb.count,
                    )
        packed = jax.lax.psum(packed, axis)  # the halo exchange
        eta = vb.prior_eta + packed[:, :d]
        lam = vb.prior_lam + packed[:, d:].reshape(vb.count, d, d)
        mean = sweep_mod.scaled_sym_solve(lam, eta)
        new_v.append(VariableState(eta=eta, lam=lam, mean=mean))
    return state.replace(v=tuple(new_v))


def _sweep_local(graph: Graph, state: GBPState, cfg: GBPConfig, axis: str) -> GBPState:
    """One GBP sweep inside shard_map: local factor math + psum halo."""
    new_f = []
    for fi, fb in enumerate(graph.fblocks):
        fs = state.f[fi]
        act = fb.valid
        beliefs, x = sweep_mod._gather_beliefs_and_means(graph, state, fi)
        if sweep_mod._use_fused_relin(cfg, fb):
            fs = sweep_mod._fused_relin_messages(fb, fs, beliefs, x, cfg, act)
        else:
            fs = sweep_mod._relinearize(fb, fs, x, cfg, act)
            fs = sweep_mod._compute_messages(fb, fs, beliefs, cfg, act)
        new_f.append(fs)
    state = state.replace(f=tuple(new_f))
    return _update_beliefs_local(graph, state, axis)


def make_run(mesh: Mesh, graph: Graph, state: GBPState, axis: str = "graph"):
    """Compile an SPMD run(graph, state, cfg, n_iters) over the mesh.

    graph/state must come from `distribute` (chip-major factor rows)."""
    gspec = _graph_pspec(graph, axis)
    sspec = _state_pspec(state, axis)

    @functools.partial(jax.jit, static_argnums=3)
    def run_spmd(graph, state, cfg, n_iters):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(gspec, sspec, P()),
            out_specs=sspec,
            check_vma=False,
        )
        @f32_exact
        def body(graph, state, cfg):
            def one(_, s):
                return _sweep_local(graph, s, cfg, axis)

            return jax.lax.fori_loop(0, n_iters, one, state)

        return body(graph, state, cfg)

    return run_spmd


def distribute(graph: Graph, means: tuple, mesh: Mesh, anchor_slot: int = 0):
    """Partition + place a freshly built graph; returns (graph, state).

    State is built on the partitioned graph (messages zero, linpoints at
    `means`), then both are placed: factor data sharded chip-major over the
    mesh axis, variables replicated.
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    pgraph = partition_graph(graph, n, anchor_slot)
    state = sweep_mod.init_state(pgraph, means)

    gspec = _graph_pspec(pgraph, axis)
    sspec = _state_pspec(state, axis)

    def put(x, s):
        return jax.device_put(x, NamedSharding(mesh, s))

    pgraph = jax.tree_util.tree_map(put, pgraph, gspec)
    state = jax.tree_util.tree_map(put, state, sspec)
    return pgraph, state
