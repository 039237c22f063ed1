"""Distributed Schur-complement Gauss-Newton (gbp_tpu/parallel/schur.py):
one step from the initial linearization must reproduce the dense-MAP oracle
solution (identical linear system, different elimination order), and the
reductions must work under a sharded mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.oracle import map_solution
from gbp_tpu.core.sweep import init_state
from gbp_tpu.models import ba
from gbp_tpu.parallel import schur, sharding


def test_schur_step_matches_dense_oracle():
    sim = ba.simulate(n_cams=8, n_lmks=120, seed=0)
    graph, means = ba.build(sim, dtype=jnp.float64)
    state = init_state(graph, means)  # linpoints = means
    expected = map_solution(graph, state)

    got = schur.gauss_newton_step(graph, means, cg_iters=200)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(expected[0]),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(expected[1]),
                               rtol=1e-7, atol=1e-9)


def test_schur_solve_reduces_reprojection_error():
    sim = ba.simulate(n_cams=10, n_lmks=150, seed=1)
    graph, means = ba.build(sim, dtype=jnp.float64)
    state = init_state(graph, means)
    are0 = float(ba.avg_reprojection_error(graph, state, k=sim["k"]))

    out = schur.solve(graph, means, n_steps=4, cg_iters=100)
    state2 = ba.with_means(state, out)
    are = float(ba.avg_reprojection_error(graph, state2, k=sim["k"]))
    assert are < are0 * 0.2, (are0, are)
    assert are < 1.5, are


def test_schur_with_huber_matches_oracle():
    sim = ba.simulate(n_cams=7, n_lmks=90, seed=2)
    graph, means = ba.build(sim, huber=2.0, dtype=jnp.float64)
    state = init_state(graph, means)
    expected = map_solution(graph, state)
    got = schur.gauss_newton_step(graph, means, cg_iters=200)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(expected[0]),
                               rtol=1e-6, atol=1e-8)


def test_schur_sharded_matches_single_device():
    sim = ba.simulate(n_cams=8, n_lmks=100, seed=3)
    graph, means = ba.build(sim, dtype=jnp.float64)
    single = schur.gauss_newton_step(graph, means, cg_iters=100)

    mesh = sharding.make_mesh(8)
    state = init_state(graph, means)
    g_sh, _ = sharding.distribute(graph, state, mesh)
    multi = schur.gauss_newton_step(g_sh, means, cg_iters=100)
    np.testing.assert_allclose(np.asarray(multi[0]), np.asarray(single[0]),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(multi[1]), np.asarray(single[1]),
                               rtol=1e-9, atol=1e-12)


def test_pcg_gn_matches_dense_oracle_on_pose_graph():
    """gauss_newton_step_pcg (full-system block-Jacobi PCG — the same-block
    pose-graph MAP target) solves the SAME linear system as the dense oracle
    at the same linearization, Huber included (merged per-factor thresholds:
    robust loop closures + non-robust odometry)."""
    from gbp_tpu.models import pose_graph

    sim = pose_graph.simulate_manhattan(n_poses=50, seed=0, loop_prob=0.3,
                                        loop_radius=3.0)
    graph, means = pose_graph.build(sim, layout="none", dtype=jnp.float64)
    state = init_state(graph, means)
    expected = map_solution(graph, state)
    got = schur.gauss_newton_step_pcg(graph, means, cg_iters=400)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(expected[0]),
                               rtol=1e-7, atol=1e-9)


def test_pcg_gn_matches_schur_elimination_on_ba():
    """Full-system PCG and camera/landmark Schur elimination are different
    solvers of identical normal equations — one step from the same means
    must agree."""
    sim = ba.simulate(n_cams=8, n_lmks=120, seed=4)
    graph, means = ba.build(sim, huber=2.0, dtype=jnp.float64)
    a = schur.gauss_newton_step(graph, means, cg_iters=250)
    b = schur.gauss_newton_step_pcg(graph, means, cg_iters=400)
    np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(b[1]), np.asarray(a[1]),
                               rtol=1e-6, atol=1e-8)


def test_pcg_gn_solve_converges_on_pose_graph():
    from gbp_tpu.models import pose_graph

    sim = pose_graph.simulate_manhattan(n_poses=80, seed=1, loop_prob=0.3,
                                        loop_radius=3.0)
    graph, means = pose_graph.build(sim, layout="none", dtype=jnp.float64)
    ate0 = pose_graph.ate(np.asarray(means[0]), sim["truth"])
    mu = schur.solve_pcg(graph, means, n_steps=6, cg_iters=200)
    ate = pose_graph.ate(np.asarray(mu[0]), sim["truth"])
    assert ate < 0.5 * ate0, (ate0, ate)
