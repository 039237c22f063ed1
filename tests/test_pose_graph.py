"""Config[1]: 2D Manhattan pose-graph SLAM with Huber loop closures.

Quality bar: the dense-MAP oracle on the same (final) linearization is the
achievable optimum; GBP must land within a small factor of its ATE.  Absolute
convergence to the MAP vector itself is only checked on a loop-rich small
graph — the near-null global gauge mode (absolute offset from the anchor)
converges at O(diameter) sweeps and is invisible to the aligned ATE metric.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.oracle import map_solution
from gbp_tpu.core.sweep import init_state, run
from gbp_tpu.models import pose_graph


def _solve(sim, n_iters=200, **build_kw):
    graph, means = pose_graph.build(sim, dtype=jnp.float64, **build_kw)
    state = init_state(graph, means)
    cfg = pose_graph.default_config()
    state = jax.jit(run, static_argnums=3)(graph, state, cfg, n_iters)
    return graph, state


def test_pose_graph_improves_ate_to_near_map():
    sim = pose_graph.simulate_manhattan(n_poses=120, seed=0)
    ate_init = pose_graph.ate(sim["init"], sim["truth"])
    graph, state = _solve(sim)
    est = np.asarray(state.v[0].mean)
    assert np.isfinite(est).all()
    ate_final = pose_graph.ate(est, sim["truth"])
    ate_map = pose_graph.ate(np.asarray(map_solution(graph, state)[0]), sim["truth"])
    assert ate_final < ate_init, (ate_init, ate_final)
    assert ate_final < 1.3 * ate_map + 0.02, (ate_final, ate_map)


def test_pose_graph_matches_linearized_map():
    # Loop-rich small graph: GBP means match the dense MAP of the final
    # linearization (SURVEY.md §3.4 oracle).
    sim = pose_graph.simulate_manhattan(n_poses=60, seed=4, loop_prob=0.6, loop_radius=3.0)
    assert sim["loop_ij"].shape[0] >= 10
    graph, state = _solve(sim, n_iters=1000)
    expected = np.asarray(map_solution(graph, state)[0])
    got = np.asarray(state.v[0].mean)
    np.testing.assert_allclose(got, expected, atol=0.025)


def test_pose_graph_huber_beats_non_robust_on_outliers():
    sim = pose_graph.simulate_manhattan(n_poses=120, seed=5, loop_prob=0.4, outlier_frac=0.15)
    assert sim["loop_ij"].shape[0] >= 10
    _, state_h = _solve(sim, huber=2.0)
    _, state_n = _solve(sim, huber=None)
    ate_h = pose_graph.ate(np.asarray(state_h.v[0].mean), sim["truth"])
    ate_n = pose_graph.ate(np.asarray(state_n.v[0].mean), sim["truth"])
    assert ate_h < ate_n, (ate_h, ate_n)


def test_pose_graph_f32_matches_f64_quality():
    # The f32 path (the TPU path) must reach f64-equivalent ATE; exercises the
    # cavity roundoff floor (GBPConfig.cavity_floor auto mode).
    sim = pose_graph.simulate_manhattan(n_poses=120, seed=0)
    _, s64 = _solve(sim)
    g32, m32 = pose_graph.build(sim, dtype=jnp.float32)
    s32 = init_state(g32, m32)
    s32 = jax.jit(run, static_argnums=3)(g32, s32, pose_graph.default_config(), 200)
    est32 = np.asarray(s32.v[0].mean)
    assert np.isfinite(est32).all()
    ate32 = pose_graph.ate(est32, sim["truth"])
    ate64 = pose_graph.ate(np.asarray(s64.v[0].mean), sim["truth"])
    assert ate32 < ate64 * 1.2 + 0.02, (ate32, ate64)
