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


def _compose(t1, w1, t2, w2):
    """World pose composition: (t, w) represents T = (R=exp(w), t)."""
    r1 = np.asarray(so3_exp(jnp.asarray(w1)))
    t = t1 + r1 @ t2
    r = r1 @ np.asarray(so3_exp(jnp.asarray(w2)))
    return t, np.asarray(so3_log(jnp.asarray(r)))


def _relative(t1, w1, t2, w2):
    r1 = np.asarray(so3_exp(jnp.asarray(w1)))
    dt = r1.T @ (t2 - t1)
    dr = r1.T @ np.asarray(so3_exp(jnp.asarray(w2)))
    return np.concatenate([dt, np.asarray(so3_log(jnp.asarray(dr)))])


def simulate_se3(n_poses=30, seed=0, odom_sigma=0.02, loop_every=7):
    """Helical 3D trajectory with odometry + a few loop closures."""
    rng = np.random.default_rng(seed)
    truth = np.zeros((n_poses, 6))  # [t (3), omega (3)]
    t, w = np.zeros(3), np.zeros(3)
    for i in range(1, n_poses):
        step_t = np.array([1.0, 0.1 * np.sin(i * 0.5), 0.15])
        step_w = np.array([0.0, 0.02, 0.2])
        t, w = _compose(t, w, step_t, step_w)
        truth[i] = np.concatenate([t, w])

    edges = [(i, i + 1) for i in range(n_poses - 1)]
    edges += [(i, i + loop_every) for i in range(0, n_poses - loop_every, loop_every)]
    ij = np.asarray(edges)
    z = np.stack([
        _relative(truth[i, :3], truth[i, 3:], truth[j, :3], truth[j, 3:])
        + odom_sigma * rng.standard_normal(6)
        for i, j in edges
    ])
    info = np.tile(np.eye(6) / odom_sigma**2, (len(edges), 1, 1))

    init = truth + 0.05 * rng.standard_normal(truth.shape)
    init[0] = truth[0]
    return dict(kind="se3", poses=init, edges_ij=ij, edges_z=z, edges_info=info,
                truth=truth)


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
