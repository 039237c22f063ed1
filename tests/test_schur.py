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
