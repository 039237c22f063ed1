"""GBP exactness on linear graphs — the reference's strongest invariant
(SURVEY.md §4.2): on linear-factor graphs GBP marginal means converge to the
dense MAP solution to machine precision (arXiv:2107.02308 §2.4)."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.graph import GraphBuilder
from gbp_tpu.core.oracle import map_solution, marginal_covariances
from gbp_tpu.core.sweep import GBPConfig, energy, init_state, run, sweep
from gbp_tpu.factors import linear


def build_chain(n=12, seed=0, dtype=jnp.float64):
    """Scalar chain: displacement factors between neighbors + noisy unary obs."""
    rng = np.random.default_rng(seed)
    truth = np.cumsum(rng.standard_normal(n))
    obs = truth + 0.3 * rng.standard_normal(n)
    disp = np.diff(truth) + 0.1 * rng.standard_normal(n - 1)

    b = GraphBuilder(dtype=dtype)
    v = b.add_variables("x", np.zeros((n, 1)), prior_prec=1e-4)
    b.add_factors(
        "obs",
        linear.observation(1),
        [(v, np.arange(n))],
        obs[:, None],
        sigma=0.3,
    )
    b.add_factors(
        "disp",
        linear.displacement(1),
        [(v, np.arange(n - 1)), (v, np.arange(1, n))],
        disp[:, None],
        sigma=0.1,
    )
    return b.build()


def test_linear_chain_converges_to_map():
    graph, means = build_chain()
    state = init_state(graph, means)
    cfg = GBPConfig(eta_damping=0.0, num_undamped_iters=0, min_linear_iters=1)
    state = jax.jit(run, static_argnums=3)(graph, state, cfg, 60)
    expected = map_solution(graph, state)[0]
    got = state.v[0].mean
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-10)


def test_linear_chain_damped_also_converges():
    graph, means = build_chain(seed=3)
    state = init_state(graph, means)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=3, min_linear_iters=2)
    state = jax.jit(run, static_argnums=3)(graph, state, cfg, 120)
    expected = map_solution(graph, state)[0]
    np.testing.assert_allclose(np.asarray(state.v[0].mean), np.asarray(expected), atol=1e-9)


def test_energy_decreases():
    graph, means = build_chain(seed=5)
    state = init_state(graph, means)
    cfg = GBPConfig(eta_damping=0.0, num_undamped_iters=0, min_linear_iters=1)
    e0 = float(energy(graph, state))
    state = jax.jit(run, static_argnums=3)(graph, state, cfg, 40)
    e1 = float(energy(graph, state))
    assert e1 < e0


def test_tree_marginal_covariances_exact():
    # On tree graphs (the chain) GBP marginal covariances are exact too.
    graph, means = build_chain(n=8, seed=7)
    state = init_state(graph, means)
    cfg = GBPConfig(eta_damping=0.0, num_undamped_iters=0, min_linear_iters=1)
    state = jax.jit(run, static_argnums=3)(graph, state, cfg, 60)
    exact_cov = marginal_covariances(graph, state)[0]
    got_cov = np.linalg.inv(np.asarray(state.v[0].lam))
    np.testing.assert_allclose(got_cov, np.asarray(exact_cov), atol=1e-10)


def test_f32_close_to_f64():
    graph64, means64 = build_chain(seed=11, dtype=jnp.float64)
    graph32, means32 = build_chain(seed=11, dtype=jnp.float32)
    cfg = GBPConfig(eta_damping=0.0, num_undamped_iters=0, min_linear_iters=1)
    s64 = init_state(graph64, means64)
    s32 = init_state(graph32, means32)
    s64 = jax.jit(run, static_argnums=3)(graph64, s64, cfg, 60)
    s32 = jax.jit(run, static_argnums=3)(graph32, s32, cfg, 60)
    np.testing.assert_allclose(
        np.asarray(s32.v[0].mean), np.asarray(s64.v[0].mean), atol=1e-3
    )
