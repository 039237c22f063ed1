"""3D (SE(3)) pose-graph SLAM end-to-end: g2o-style graph with full 6x6 edge
information converges to the dense-MAP oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from gbp_tpu.core.oracle import map_solution
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.factors.se3 import se3_between
from gbp_tpu.models import pose_graph
from gbp_tpu.utils.lie import so3_exp, so3_log


def simulate_se3(n_poses=30, seed=0, odom_sigma=0.02, loop_every=7):
    """Helical 3D trajectory with odometry + a few loop closures (the model
    simulator, kept under this historical name for the cross-test imports)."""
    return pose_graph.simulate_helix(n_poses=n_poses, seed=seed,
                                     odom_sigma=odom_sigma,
                                     loop_every=loop_every)


def test_se3_pose_graph_converges_to_map():
    data = simulate_se3()
    graph, means = pose_graph.build_g2o(data, dtype=jnp.float64)
    assert graph.fblocks[0].ftype.name == "se3_between"
    state = init_state(graph, means)
    # Tight beta: the GBP-vs-oracle gap at the fixed point is bounded by the
    # relinearization threshold (stale linpoints within beta of the means).
    cfg = pose_graph.default_config().replace(beta=1e-3)
    state = jax.jit(run, static_argnums=3)(graph, state, cfg, 600)
    mu = map_solution(graph, state)
    err = float(jnp.abs(state.v[0].mean - mu[0]).max())
    assert err < 5e-3, err
    # And the MAP is near the ground truth (translations).
    t_err = np.abs(np.asarray(state.v[0].mean)[:, :3] - data["truth"][:, :3]).max()
    assert t_err < 0.5, t_err


def test_se3_between_jacobian_matches_autodiff():
    ft = se3_between()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(12) * 0.4)
    j_auto = jax.jacfwd(ft.meas_fn)(x, None)
    assert j_auto.shape == (6, 12)
    # Finite-difference cross-check of the autodiff path the engine uses.
    eps = 1e-6
    j_fd = np.zeros((6, 12))
    h0 = np.asarray(ft.meas(x, None))
    for k in range(12):
        xp = x.at[k].add(eps)
        j_fd[:, k] = (np.asarray(ft.meas(xp, None)) - h0) / eps
    np.testing.assert_allclose(np.asarray(j_auto), j_fd, atol=1e-4)
