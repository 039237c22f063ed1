"""Multi-chip GBP: factor-sharded SPMD sweeps over a device mesh.

The reference is single-process serial Python (SURVEY.md §2 'Parallelism —
none'); this module is the TPU-native scaling design from BASELINE.json's
north star.  Round-1 scheme — "graph data parallel":

  * every factor block is sharded along its factor axis over mesh axis
    "graph" (factors are embarrassingly parallel — the thesis of running GBP
    on many-core hardware, arXiv:2003.03134 §4.2);
  * variable beliefs are replicated; the per-sweep belief update's
    segment-sums become partial sums on each chip which GSPMD reduces with a
    psum over ICI (the "halo exchange" degenerates to an all-reduce because
    every chip can touch any variable).

We express this with `jax.jit` + `NamedSharding` on the inputs and let the
XLA SPMD partitioner insert the collectives (mesh-and-annotations recipe: pick
a mesh, annotate shardings, let XLA do the rest).  A keyframe-partitioned
subgraph scheme with ppermute halo exchange (lower comm volume for huge
graphs) is the planned next stage; this path already gives correct multi-chip
execution and weak scaling of the factor math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gbp_tpu.core.graph import FactorBlock, Graph
from gbp_tpu.core.sweep import GBPState


def make_mesh(n_devices: int | None = None, axis: str = "graph") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_rows(arr, target, fill=0):
    pad = target - arr.shape[0]
    if pad == 0:
        return arr
    cfg = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, cfg, constant_values=fill)


def pad_graph(graph: Graph, n_devices: int) -> Graph:
    """Pad every factor block to a multiple of n_devices with invalid dummies.

    Dummy factors point at variable 0 with unit precision and valid=False:
    the sweep masks them (messages stay zero) and energy ignores them.
    """
    new_fblocks = []
    for fb in graph.fblocks:
        # Appending rows breaks the ELL row-grouping invariant; drop the
        # markers (the sharded path uses segment_sum regardless).
        fb = fb.replace(ell_slot=None, ell_deg=0)
        m = fb.count
        target = ((m + n_devices - 1) // n_devices) * n_devices
        valid = fb.valid
        if valid is None:
            valid = jnp.ones((m,), dtype=bool)
        if fb.n_valid is None:
            fb = fb.replace(n_valid=int(np.asarray(valid).sum()))
        if target != m:
            fb = fb.replace(
                adj=tuple(_pad_rows(a, target) for a in fb.adj),
                z=_pad_rows(fb.z, target),
                prec=_pad_rows(fb.prec, target, fill=1),
                args=None if fb.args is None else jax.tree_util.tree_map(
                    lambda a: _pad_rows(a, target), fb.args
                ),
                huber_arr=None if fb.huber_arr is None
                else _pad_rows(fb.huber_arr, target),
                valid=_pad_rows(valid, target, fill=False),
            )
        else:
            fb = fb.replace(valid=valid)
        new_fblocks.append(fb)
    return graph.replace(fblocks=tuple(new_fblocks))


def _fblock_spec(fb: FactorBlock, mesh: Mesh, axis: str):
    """NamedSharding pytree for a FactorBlock: factor axis sharded."""

    def shard(a):
        return NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))

    return fb.replace(
        adj=tuple(shard(a) for a in fb.adj),
        z=shard(fb.z),
        prec=shard(fb.prec),
        args=None if fb.args is None else jax.tree_util.tree_map(shard, fb.args),
        huber_arr=None if fb.huber_arr is None else shard(fb.huber_arr),
        valid=None if fb.valid is None else shard(fb.valid),
    )


def _replicated(tree, mesh):
    return jax.tree_util.tree_map(
        lambda a: NamedSharding(mesh, P()), tree
    )


def shard_graph(graph: Graph, mesh: Mesh, axis: str = "graph") -> Graph:
    """Place the graph: factor blocks sharded over the mesh, priors replicated."""
    specs = graph.replace(
        vblocks=_replicated(graph.vblocks, mesh),
        fblocks=tuple(_fblock_spec(fb, mesh, axis) for fb in graph.fblocks),
    )
    return jax.tree_util.tree_map(jax.device_put, graph, specs)


def shard_state(state: GBPState, mesh: Mesh, axis: str = "graph") -> GBPState:
    """Place GBP state: factor states sharded, variable states replicated."""

    def fspec(a):
        return NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))

    specs = state.replace(
        v=_replicated(state.v, mesh),
        f=jax.tree_util.tree_map(fspec, state.f),
    )
    return jax.tree_util.tree_map(jax.device_put, state, specs)


def distribute(graph: Graph, state: GBPState, mesh: Mesh, axis: str = "graph"):
    """Pad + place graph and state for multi-chip sweeps.

    After this, plain `jax.jit(run/sweep)` executes SPMD: factor math runs
    sharded, belief updates all-reduce over ICI.  Returns (graph, state).
    """
    n = mesh.devices.size
    # Drop dense inboxes: under GSPMD the gather form would all-gather the
    # sharded factor messages; the scatter form reduces to a psum of
    # per-chip partial sums (far less ICI traffic).
    padded = pad_graph(graph, n).replace(inboxes=None)
    # State must be rebuilt if padding changed factor counts.
    if any(
        pf.count != of.count for pf, of in zip(padded.fblocks, graph.fblocks)
    ):
        from gbp_tpu.core.sweep import init_state

        means = tuple(vs.mean for vs in state.v)
        state = init_state(padded, means)
    return shard_graph(padded, mesh, axis), shard_state(state, mesh, axis)
