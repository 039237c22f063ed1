"""Dense exact-MAP oracle for validation.

Equivalent of the reference's `Graph.joint_distribution_inf()` + dense solve
(joeaortiz/gbp `gbp/gbp.py`; SURVEY.md §3.4): assemble the full joint
information form over all variables from priors + (Huber-scaled, currently
linearized) factor potentials, and solve for the MAP mean.  On convergence GBP
marginal means must match this solution — exactly for linear graphs, to the
relinearization fixed point otherwise (arXiv:2107.02308 §2.4).

This is a test/validation path: dense O(D^2) memory, not performance-critical.
"""
from __future__ import annotations

import jax.numpy as jnp

from gbp_tpu.core.graph import Graph
from gbp_tpu.core.sweep import GBPState, f32_exact, factor_potential, huber_weight


def _voffsets(graph: Graph):
    offs, acc = [], 0
    for vb in graph.vblocks:
        offs.append(acc)
        acc += vb.count * vb.dof
    return offs, acc


@f32_exact
def dense_joint(graph: Graph, state: GBPState):
    """Assemble (eta [D], lam [D, D]) of the full joint at current linpoints."""
    offs, dim = _voffsets(graph)
    dt = state.v[0].mean.dtype
    eta = jnp.zeros((dim,), dt)
    lam = jnp.zeros((dim, dim), dt)

    # Priors.
    for vi, vb in enumerate(graph.vblocks):
        n, d = vb.count, vb.dof
        idx = offs[vi] + jnp.arange(n * d)
        eta = eta.at[idx].add(vb.prior_eta.reshape(-1).astype(dt))
        block = idx.reshape(n, d)
        lam = lam.at[block[:, :, None], block[:, None, :]].add(vb.prior_lam.astype(dt))

    # Factor potentials (with the same Huber scaling the messages see).
    for fi, fb in enumerate(graph.fblocks):
        fs = state.f[fi]
        w = huber_weight(fb, fs.r0)
        pot_eta, pot_lam = factor_potential(fb, fs)
        f_eta = pot_eta * w[:, None]
        f_lam = pot_lam * w[:, None, None]
        if fb.valid is not None:
            # Select (not scale): padded rows may hold non-finite values.
            f_eta = jnp.where(fb.valid[:, None], f_eta, 0.0)
            f_lam = jnp.where(fb.valid[:, None, None], f_lam, 0.0)
        gidx = jnp.concatenate(
            [
                offs[vb] + fb.adj[k][:, None] * fb.dofs[k] + jnp.arange(fb.dofs[k])[None, :]
                for k, vb in enumerate(fb.vblocks)
            ],
            axis=-1,
        )  # [m, tdof] global dim indices
        eta = eta.at[gidx].add(f_eta.astype(dt))
        lam = lam.at[gidx[:, :, None], gidx[:, None, :]].add(f_lam.astype(dt))
    return eta, lam


@f32_exact
def map_solution(graph: Graph, state: GBPState):
    """Dense MAP means, returned per variable block: tuple of [n, d]."""
    eta, lam = dense_joint(graph, state)
    mu = jnp.linalg.solve(lam, eta)
    offs, _ = _voffsets(graph)
    out = []
    for vi, vb in enumerate(graph.vblocks):
        n, d = vb.count, vb.dof
        out.append(mu[offs[vi] : offs[vi] + n * d].reshape(n, d))
    return tuple(out)


@f32_exact
def marginal_covariances(graph: Graph, state: GBPState):
    """Exact per-variable marginal covariances (dense inverse), per block."""
    eta, lam = dense_joint(graph, state)
    cov = jnp.linalg.inv(lam)
    offs, _ = _voffsets(graph)
    out = []
    for vi, vb in enumerate(graph.vblocks):
        n, d = vb.count, vb.dof
        idx = (offs[vi] + jnp.arange(n * d)).reshape(n, d)
        out.append(cov[idx[:, :, None], idx[:, None, :]])
    return tuple(out)
