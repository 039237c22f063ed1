"""Config[0]: 1D line-fitting toy — GBP exact on linear graphs
(the reference's primary sanity config, SURVEY.md §4.2)."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.oracle import map_solution
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import toy


def test_toy_line_fitting_exact():
    sim = toy.simulate(n=60, seed=0)
    graph, means = toy.build(sim, dtype=jnp.float64)
    state = init_state(graph, means)
    cfg = GBPConfig(eta_damping=0.0, num_undamped_iters=0, min_linear_iters=1)
    state = jax.jit(run, static_argnums=3)(graph, state, cfg, 150)
    expected = map_solution(graph, state)[0]
    np.testing.assert_allclose(np.asarray(state.v[0].mean),
                               np.asarray(expected), atol=1e-9)
    # The smoothed estimate tracks the ground truth well inside noise level.
    rmse = float(np.sqrt(np.mean(
        (np.asarray(state.v[0].mean)[:, 0] - sim["truth"]) ** 2)))
    assert rmse < sim["obs_sigma"], rmse
