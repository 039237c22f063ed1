"""Wildfire / priority schedules (SURVEY.md §2 'schedules'; arXiv:1910.14139
§5.2): masked sweeps must converge to the same fixed point as synchronous GBP
(arXiv:2107.02308 §3.5 — GBP converges under arbitrary schedules)."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.oracle import map_solution
from gbp_tpu.core.schedules import (
    init_schedule,
    priority_masks,
    run_priority,
    run_random,
    run_wildfire,
    wildfire_masks,
)
from gbp_tpu.core.sweep import GBPConfig, init_state, run

from tests.test_sweep_linear import build_chain

CFG = GBPConfig(eta_damping=0.0, num_undamped_iters=0, min_linear_iters=1)


def test_wildfire_all_active_matches_synchronous():
    graph, means = build_chain(seed=0)
    state = init_state(graph, means)
    # tau < 0 makes every factor active every sweep == synchronous schedule.
    s_wf = jax.jit(run_wildfire, static_argnums=3)(graph, state, CFG, 20, -1.0)
    s_sync = jax.jit(run, static_argnums=3)(graph, state, CFG, 20)
    np.testing.assert_allclose(
        np.asarray(s_wf.v[0].mean), np.asarray(s_sync.v[0].mean), atol=1e-12
    )


def test_wildfire_threshold_converges_to_map():
    graph, means = build_chain(seed=1)
    state = init_state(graph, means)
    state = jax.jit(run_wildfire, static_argnums=3)(graph, state, CFG, 150, 1e-6)
    expected = map_solution(graph, state)[0]
    np.testing.assert_allclose(
        np.asarray(state.v[0].mean), np.asarray(expected), atol=1e-6
    )


def test_priority_halves_converge_to_map():
    graph, means = build_chain(seed=2)
    state = init_state(graph, means)
    state = jax.jit(run_priority, static_argnums=(3, 4))(graph, state, CFG, 200, 0.5)
    expected = map_solution(graph, state)[0]
    np.testing.assert_allclose(
        np.asarray(state.v[0].mean), np.asarray(expected), atol=1e-6
    )


def test_random_dropout_converges_to_map():
    # Message-loss robustness (arXiv:2107.02308 §3.5): GBP still reaches the
    # MAP fixed point when 30% of factors drop out of every sweep.
    graph, means = build_chain(seed=6)
    state = init_state(graph, means)
    key = jax.random.PRNGKey(0)
    state = jax.jit(run_random, static_argnums=3)(graph, state, CFG, 250, 0.7, key)
    expected = map_solution(graph, state)[0]
    np.testing.assert_allclose(
        np.asarray(state.v[0].mean), np.asarray(expected), atol=1e-6
    )


def test_masks_shapes_and_first_sweep():
    graph, means = build_chain(seed=3)
    state = init_state(graph, means)
    sched = init_schedule(graph, state)
    wf = wildfire_masks(graph, state, sched, 1e-3)
    assert len(wf) == len(graph.fblocks)
    for m, fb in zip(wf, graph.fblocks):
        assert m.shape == (fb.count,) and m.dtype == jnp.bool_
        # First sweep: everything urgent (init_schedule seeds infinite scores).
        assert bool(m.all())
    pr = priority_masks(graph, state, sched, 0.25)
    for m, fb in zip(pr, graph.fblocks):
        k = max(1, int(0.25 * fb.count))
        assert int(m.sum()) >= k  # ties may admit more
