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
    ftype: FactorType = flax.struct.field(pytree_node=False, default=None)
    vblocks: tuple = flax.struct.field(pytree_node=False, default=())  # vblock idx per slot
    dofs: tuple = flax.struct.field(pytree_node=False, default=())  # dof per slot
    huber: float | None = flax.struct.field(pytree_node=False, default=None)
    name: str = flax.struct.field(pytree_node=False, default="factor")

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
        [m, zdim]) or pass `prec` directly.  huber: Mahalanobis threshold.
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
        self._fblocks.append(
            dict(name=name, ftype=ftype, conns=conns, z=z, prec=prec, args=args,
                 huber=huber)
        )
        return len(self._fblocks) - 1

    def build(self):
        """Returns (Graph, init_means) as device arrays."""
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
        fblocks = []
        for fb in self._fblocks:
            vb_ids = tuple(vb for vb, _ in fb["conns"])
            dofs = tuple(self._vblocks[vb]["init"].shape[1] for vb in vb_ids)
            args = fb["args"]
            if args is not None:
                args = jnp.asarray(np.asarray(args), dtype=dt)
            fblocks.append(
                FactorBlock(
                    adj=tuple(jnp.asarray(idx) for _, idx in fb["conns"]),
                    z=jnp.asarray(fb["z"], dtype=dt),
                    prec=jnp.asarray(fb["prec"], dtype=dt),
                    args=args,
                    ftype=fb["ftype"],
                    vblocks=vb_ids,
                    dofs=dofs,
                    huber=fb["huber"],
                    name=fb["name"],
                )
            )
        inboxes = build_inboxes(fblocks, [vb.count for vb in vblocks])
        return (
            Graph(vblocks=tuple(vblocks), fblocks=tuple(fblocks), inboxes=inboxes),
            tuple(init_means),
        )
