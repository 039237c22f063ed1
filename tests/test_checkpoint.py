"""Checkpoint/resume: a restored run must continue bit-identically
(SURVEY.md §5 — the whole algorithm state is the GBPState pytree)."""
import jax
import numpy as np

from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.utils import checkpoint

from tests.test_sweep_linear import build_chain

CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=3, min_linear_iters=2)


def test_save_restore_resume_identical(tmp_path):
    graph, means = build_chain(seed=4)
    state = init_state(graph, means)
    runj = jax.jit(run, static_argnums=3)

    state = runj(graph, state, CFG, 7)  # mid-run (messages, counters nonzero)
    checkpoint.save(tmp_path / "ckpt", state, graph=graph)

    # Straight-through reference.
    ref = runj(graph, state, CFG, 9)

    # Restore into fresh templates and resume.
    template = init_state(graph, means)
    r_state, r_graph = checkpoint.restore(tmp_path / "ckpt", template, graph)
    for a, b in zip(
        jax.tree_util.tree_leaves(r_state), jax.tree_util.tree_leaves(state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    resumed = runj(r_graph, r_state, CFG, 9)
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed), jax.tree_util.tree_leaves(ref)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
