"""Factor graph as structure-of-arrays with static topology.

The reference (joeaortiz/gbp `gbp/gbp.py`, SURVEY.md C2-C4) stores the graph as
Python objects with per-edge message objects and loops over them.  That design
cannot map onto a TPU.  Here the graph is a pytree of arrays:

  * variables are grouped into `VariableBlock`s by dof class (e.g. cameras
    [Nc, 6], landmarks [Nl, 3]) so nothing is ragged or padded;
  * factors are grouped into `FactorBlock`s by factor type; topology is int32
    index arrays (factor -> variable ids per slot);
  * one GBP sweep is a handful of fused batched XLA ops / Pallas kernels over
    these arrays — no Python-level per-node work at all.

Static metadata (dofs, factor types, slot wiring) lives in pytree aux data, so
`jax.jit` compiles once per graph *shape* and re-runs for any values.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import numpy as np

from gbp_tpu.factors.base import FactorType


class _Static(flax.struct.PyTreeNode):
    pass


class VariableBlock(flax.struct.PyTreeNode):
    """A group of `n` variables sharing one dof class.

    prior_eta/prior_lam hold each variable's (possibly weak) unary prior in
    information form (reference: VariableNode.prior, SURVEY.md C2).
    """

    prior_eta: jnp.ndarray  # [n, d]
    prior_lam: jnp.ndarray  # [n, d, d]
    name: str = flax.struct.field(pytree_node=False, default="var")

    @property
    def count(self) -> int:
        return self.prior_eta.shape[0]

    @property
    def dof(self) -> int:
        return self.prior_eta.shape[-1]


class FactorBlock(flax.struct.PyTreeNode):
    """A group of `m` same-type factors.

    adj[k] is an [m] int32 array: which variable (within variable block
    `vblocks[k]`) slot k of each factor connects to.  z is the measurement,
    prec the diagonal measurement precision (Lambda_meas = diag(prec)), args an
    optional pytree of per-factor parameters for the measurement model.
    `huber` is the Mahalanobis threshold (in std-devs) for covariance-scaling
    robustification (SURVEY.md C6), or None to disable.
    """

    adj: tuple  # tuple of [m] int32, one per slot
    z: jnp.ndarray  # [m, zdim]
    prec: jnp.ndarray  # [m, zdim]
    args: Any = None
    # Padding mask: False rows are structural dummies (device-count padding);
    # their messages stay zero and they contribute nothing to energy.
    valid: jnp.ndarray | None = None
    # Per-factor Huber thresholds [m] (0 = robustification off for that
    # factor); lets one block mix robust and non-robust factors (merged
    # odometry + loop-closure pose-graph blocks).  Mutually exclusive with
    # the static `huber`.
    huber_arr: jnp.ndarray | None = None
    ftype: FactorType = flax.struct.field(pytree_node=False, default=None)
    vblocks: tuple = flax.struct.field(pytree_node=False, default=())  # vblock idx per slot
    dofs: tuple = flax.struct.field(pytree_node=False, default=())  # dof per slot
    huber: float | None = flax.struct.field(pytree_node=False, default=None)
    name: str = flax.struct.field(pytree_node=False, default="factor")
    # Number of REAL (valid) factors — static so schedules can size top-k
    # budgets by true factor count, not padded row count.  None means all
    # `count` rows are real.
    n_valid: int | None = flax.struct.field(pytree_node=False, default=None)
    # ELL layout (see GraphBuilder.build): rows grouped by slot `ell_slot`'s
    # variable, padded to a uniform degree `ell_deg` (row r belongs to
    # variable r // ell_deg).  Enables gather-free belief broadcast and
    # scatter-free reshape-sum belief updates for that slot.  None = plain
    # (unordered) row layout.
    ell_slot: int | None = flax.struct.field(pytree_node=False, default=None)
    ell_deg: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def count(self) -> int:
        return self.z.shape[0]

    @property
    def tdof(self) -> int:
        return sum(self.dofs)

    @property
    def offsets(self) -> tuple:
        out, acc = [], 0
        for d in self.dofs:
            out.append(acc)
            acc += d
        return tuple(out)


class Inbox(flax.struct.PyTreeNode):
    """Dense per-variable message inbox for one (factor block, slot) source.

    idx[v, k] is the factor row whose slot-`slot` message is variable v's k-th
    incoming message (padded with 0 where mask is False).  Belief updates
    become gather + masked reduce — no scatter, which on TPU serializes and
    dominated the sweep (measured: 88 ms of a 118 ms sweep at 470k factors
    was the segment_sum scatter; the inbox form is pure gather/reduce).
    """

    idx: jnp.ndarray  # [n, max_deg] int32
    mask: jnp.ndarray  # [n, max_deg] bool
    fi: int = flax.struct.field(pytree_node=False, default=0)
    slot: int = flax.struct.field(pytree_node=False, default=0)


class Graph(flax.struct.PyTreeNode):
    vblocks: tuple  # tuple[VariableBlock]
    fblocks: tuple  # tuple[FactorBlock]
    # inboxes[vi] = tuple[Inbox] for variable block vi, or None to use the
    # scatter (segment_sum) belief update (the GSPMD multi-chip path drops
    # inboxes: psum of partial scatter sums moves far less data than
    # all-gathering factor messages for replicated-variable gathers).
    inboxes: tuple | None = None

    def total_dim(self) -> int:
        return sum(vb.count * vb.dof for vb in self.vblocks)


def build_inboxes(fblocks, vcounts, max_pad_ratio=8.0):
    """Precompute dense inboxes from factor adjacency (host-side numpy).

    Returns tuple-per-vblock of tuples of Inbox, or None entries when the
    degree skew makes padding explode (> max_pad_ratio x the message count),
    in which case the caller should keep the scatter path for that vblock.
    """
    out = []
    for vi, n in enumerate(vcounts):
        specs = []
        ok = True
        for fi, fb in enumerate(fblocks):
            for slot, target in enumerate(fb.vblocks):
                if target != vi:
                    continue
                adj = np.asarray(fb.adj[slot])
                m = adj.shape[0]
                deg = np.bincount(adj, minlength=n)
                max_deg = max(int(deg.max()), 1)
                if n * max_deg > max_pad_ratio * max(m, 1):
                    ok = False
                    break
                order = np.argsort(adj, kind="stable")
                pos = np.arange(m) - np.concatenate([[0], np.cumsum(deg)])[adj[order]]
                idx = np.zeros((n, max_deg), dtype=np.int32)
                mask = np.zeros((n, max_deg), dtype=bool)
                idx[adj[order], pos] = order.astype(np.int32)
                mask[adj[order], pos] = True
                specs.append(
                    Inbox(idx=jnp.asarray(idx), mask=jnp.asarray(mask), fi=fi, slot=slot)
                )
            if not ok:
                break
        out.append(tuple(specs) if ok else None)
    if all(s is None for s in out):
        return None
    return tuple(out)


class GraphBuilder:
    """Host-side (numpy) builder producing a device Graph + initial means.

    Replaces the reference's imperative construction loop (SURVEY.md §3.2):
    declare variable blocks, attach factor blocks, build once.
    """

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self._vblocks: list[dict] = []
        self._fblocks: list[dict] = []

    def add_variables(self, name, init_means, prior_means=None, prior_prec=None):
        """Add a block of variables.

        init_means: [n, d] initial estimates (also the initial linearization
        points).  prior_prec: scalar, [n], or [n, d] diagonal precision of the
        unary prior; defaults to 0 (uninformative — some variables must have a
        prior or the graph is singular).
        """
        init_means = np.asarray(init_means, dtype=np.float64)
        n, d = init_means.shape
        if prior_means is None:
            prior_means = init_means
        prior_means = np.broadcast_to(np.asarray(prior_means, dtype=np.float64), (n, d)).copy()
        if prior_prec is None:
            prior_prec = 0.0
        prior_prec = np.broadcast_to(np.asarray(prior_prec, dtype=np.float64), (n, d)).copy()
        self._vblocks.append(
            dict(name=name, init=init_means, pm=prior_means, pp=prior_prec)
        )
        return len(self._vblocks) - 1

    def set_prior(self, vblock, idx, mean, prec):
        """Override the prior of variable `idx` in block `vblock` (gauge anchors)."""
        b = self._vblocks[vblock]
        b["pm"][idx] = np.asarray(mean, dtype=np.float64)
        b["pp"][idx] = np.broadcast_to(np.asarray(prec, dtype=np.float64), b["pm"][idx].shape)

    def add_factors(self, name, ftype, connections, z, sigma=None, prec=None,
                    args=None, huber=None):
        """Add a block of same-type factors.

        connections: list of (vblock_handle, idx_array [m]) — one per slot.
        z: [m, zdim] measurements.  sigma: measurement std (scalar / [m] /
        [m, zdim]) or pass `prec` directly.  huber: Mahalanobis threshold —
        a scalar for the whole block, or a per-factor [m] array (0 entries
        disable robustification for those factors; lets one block mix
        robust loop closures with non-robust odometry).
        """
        z = np.asarray(z, dtype=np.float64)
        m = z.shape[0]
        if prec is None:
            sigma = np.asarray(sigma, dtype=np.float64)
            prec = 1.0 / (sigma * sigma)
        prec = np.asarray(prec, dtype=np.float64)
        if prec.ndim == 3:
            # Full [m, zdim, zdim] measurement information matrices (g2o-style).
            assert prec.shape == (m, z.shape[1], z.shape[1]), prec.shape
        else:
            prec = np.broadcast_to(prec, z.shape).copy()
        conns = [(int(vb), np.asarray(idx, dtype=np.int32)) for vb, idx in connections]
        for _, idx in conns:
            assert idx.shape == (m,), f"adjacency shape {idx.shape} != ({m},)"
        huber_arr = None
        if huber is not None and np.ndim(huber) > 0:
            huber_arr = np.asarray(huber, dtype=np.float64)
            assert huber_arr.shape == (m,), huber_arr.shape
            huber = None
        self._fblocks.append(
            dict(name=name, ftype=ftype, conns=conns, z=z, prec=prec, args=args,
                 huber=huber, huber_arr=huber_arr)
        )
        return len(self._fblocks) - 1

    @staticmethod
    def _ell_reorder(fb: dict, vcounts: list, max_pad_ratio: float = 2.0):
        """Reorder one factor block into ELL layout (host-side).

        Picks the slot minimizing n_var * max_degree (if the padding stays
        under max_pad_ratio x the true factor count), groups rows by that
        slot's variable id, and pads every group to the max degree with
        inert clones (valid=False) of the group's first row — clones keep
        the padded rows' math finite; masks keep them inert.  Returns
        (fb, ell_slot, ell_deg).
        """
        m = fb["z"].shape[0]
        if m == 0:
            return fb, None, 0
        # Prefer grouping by the slot whose OTHER slots have the fewest
        # variables: the ELL slot's belief access becomes a free broadcast
        # and its update a reshape-sum, while the remaining slots still
        # gather/scatter — so those should read tiny tables with wide rows
        # (e.g. BA: group by landmark, leaving the 64-camera table).
        # Tiebreak by padding (rows); require rows <= max_pad_ratio * m.
        best = None
        for k, (vb, idx) in enumerate(fb["conns"]):
            deg = np.bincount(idx, minlength=vcounts[vb])
            d_max = max(int(deg.max()), 1)
            rows = vcounts[vb] * d_max
            if rows > max_pad_ratio * m:
                continue
            other = max(
                (vcounts[vb2] for j, (vb2, _) in enumerate(fb["conns"]) if j != k),
                default=0,
            )
            key = (other, rows)
            if best is None or key < best[0]:
                best = (key, k, d_max, rows)
        if best is None:
            return fb, None, 0
        _, k, d_max, rows = best
        vb_k, idx_k = fb["conns"][k]
        n = vcounts[vb_k]
        order = np.argsort(idx_k, kind="stable")
        deg = np.bincount(idx_k, minlength=n)
        starts = np.concatenate([[0], np.cumsum(deg)])
        # Destination row of each (sorted) factor: var * d_max + rank.
        rank = np.arange(m) - starts[idx_k[order]]
        dest = idx_k[order] * d_max + rank
        # Source row for every destination: group's first real row (global
        # row 0 for empty groups), overwritten by the real rows.
        first = np.zeros(n, dtype=np.int64)
        has = deg > 0
        first[has] = order[starts[:-1][has]]
        src = np.repeat(first, d_max)
        src[dest] = order
        valid = np.zeros(rows, dtype=bool)
        valid[dest] = True

        out = dict(fb)
        out["conns"] = [(vb, idx[src].copy()) for vb, idx in fb["conns"]]
        # The ELL slot's ids must match the row grouping even for clones.
        out["conns"][k] = (vb_k, np.repeat(np.arange(n, dtype=idx_k.dtype), d_max))
        out["z"] = fb["z"][src]
        out["prec"] = fb["prec"][src]
        if fb["args"] is not None:
            out["args"] = np.asarray(fb["args"])[src]
        if fb.get("huber_arr") is not None:
            out["huber_arr"] = fb["huber_arr"][src]
        out["valid"] = valid
        return out, k, d_max

    def build(self, with_inboxes: bool = False, layout: str = "none"):
        """Returns (Graph, init_means) as device arrays.

        layout: "ell" reorders every factor block into ELL form — rows
        grouped by the lowest-padding slot's variable and padded to uniform
        degree — so that slot's belief broadcast and belief update are
        gather/scatter-free reshapes (the TPU fast path); "none" keeps
        insertion order.
        with_inboxes: precompute dense per-variable inboxes (gather-form
        belief updates).  With (eta|lam)-packed wide rows the segment_sum
        scatter is now the faster default on TPU; inboxes remain available
        for schedulers/SPMD variants that want gather-form partials."""
        import warnings

        for vb in self._vblocks:
            if (vb["pp"] == 0).all(axis=-1).any():
                warnings.warn(
                    f"variable block '{vb['name']}' has variables with zero prior "
                    "precision; their initial beliefs are singular and GBP will "
                    "produce NaNs. Give every variable at least a weak prior "
                    "(the reference does the same for stability, arXiv:2003.03134 §4).",
                    stacklevel=2,
                )
        dt = self.dtype
        vblocks = []
        init_means = []
        for vb in self._vblocks:
            n, d = vb["init"].shape
            prior_lam = np.zeros((n, d, d))
            prior_lam[:, np.arange(d), np.arange(d)] = vb["pp"]
            prior_eta = vb["pp"] * vb["pm"]
            vblocks.append(
                VariableBlock(
                    prior_eta=jnp.asarray(prior_eta, dtype=dt),
                    prior_lam=jnp.asarray(prior_lam, dtype=dt),
                    name=vb["name"],
                )
            )
            init_means.append(jnp.asarray(vb["init"], dtype=dt))
        vcounts = [v["init"].shape[0] for v in self._vblocks]
        fblocks = []
        for fb in self._fblocks:
            ell_slot, ell_deg = None, 0
            if layout == "ell":
                fb, ell_slot, ell_deg = self._ell_reorder(fb, vcounts)
            vb_ids = tuple(vb for vb, _ in fb["conns"])
            dofs = tuple(self._vblocks[vb]["init"].shape[1] for vb in vb_ids)
            args = fb["args"]
            if args is not None:
                args = jnp.asarray(np.asarray(args), dtype=dt)
            valid = fb.get("valid")
            fblocks.append(
                FactorBlock(
                    adj=tuple(jnp.asarray(idx) for _, idx in fb["conns"]),
                    z=jnp.asarray(fb["z"], dtype=dt),
                    prec=jnp.asarray(fb["prec"], dtype=dt),
                    args=args,
                    valid=None if valid is None else jnp.asarray(valid),
                    huber_arr=None if fb.get("huber_arr") is None
                    else jnp.asarray(fb["huber_arr"], dtype=dt),
                    ftype=fb["ftype"],
                    vblocks=vb_ids,
                    dofs=dofs,
                    huber=fb["huber"],
                    name=fb["name"],
                    n_valid=None if valid is None else int(valid.sum()),
                    ell_slot=ell_slot,
                    ell_deg=ell_deg,
                )
            )
        inboxes = None
        if with_inboxes:
            inboxes = build_inboxes(fblocks, [vb.count for vb in vblocks])
        return (
            Graph(vblocks=tuple(vblocks), fblocks=tuple(fblocks), inboxes=inboxes),
            tuple(init_means),
        )
