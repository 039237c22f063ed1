"""Inbox (gather-form) and segment_sum (scatter-form) belief updates are two
lowerings of the same sum and must agree exactly."""
import jax
import numpy as np

from gbp_tpu.core.graph import build_inboxes
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba


def test_inbox_matches_segsum():
    sim = ba.simulate(n_cams=6, n_lmks=80, seed=0)
    import jax.numpy as jnp

    graph, means = ba.build(sim, dtype=jnp.float64)
    assert graph.inboxes is None  # scatter-form default
    inboxes = build_inboxes(graph.fblocks, [vb.count for vb in graph.vblocks])
    g_inbox = graph.replace(inboxes=inboxes)

    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    state = init_state(graph, means)
    a = jax.jit(run, static_argnums=3)(graph, state, cfg, 20)
    b = jax.jit(run, static_argnums=3)(g_inbox, state, cfg, 20)
    for va, vb_ in zip(a.v, b.v):
        np.testing.assert_allclose(np.asarray(va.mean), np.asarray(vb_.mean),
                                   rtol=1e-12, atol=1e-14)
