"""Config[2]: small bundle adjustment with relinearization + prior weakening."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.oracle import map_solution
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba


def _ba_config():
    # The reference's BA knobs (arXiv:2003.03134 §4): eta damping 0.4 after 6
    # undamped sweeps post-relin, relinearize at beta with >= 8 sweeps spacing.
    return GBPConfig(eta_damping=0.4, lam_damping=0.0, num_undamped_iters=6,
                     min_linear_iters=8, beta=0.01)


def _solve(sim, dtype=jnp.float64, n_phases=8, per_phase=10, tail=60):
    graph, means = ba.build(sim, dtype=dtype)
    state = init_state(graph, means)
    cfg = _ba_config()
    runj = jax.jit(run, static_argnums=3)
    for _ in range(n_phases):
        state = runj(graph, state, cfg, per_phase)
        graph = ba.weaken_priors(graph, factor=0.3)
    state = runj(graph, state, cfg, tail)
    return graph, state


def test_ba_converges_to_noise_floor():
    sim = ba.simulate(n_cams=12, n_lmks=300, pix_sigma=1.0, seed=0)
    graph, means = ba.build(sim, dtype=jnp.float64)
    are_init = float(ba.avg_reprojection_error(graph, init_state(graph, means), k=sim['k']))
    graph, state = _solve(sim)
    are = float(ba.avg_reprojection_error(graph, state, k=sim['k']))
    # Noise floor for |r| with 2D sigma=1 noise is ~1.25 px.
    assert are < 1.3, are
    assert are < 0.1 * are_init, (are_init, are)


def test_ba_matches_linearized_map_gauge_invariantly():
    # BA has a soft 7-dof gauge null space; GBP and the dense MAP agree on the
    # geometry (ARE, Sim(3)-aligned structure) even while both drift slowly
    # along the gauge mode.
    sim = ba.simulate(n_cams=10, n_lmks=200, pix_sigma=0.5, seed=1)
    graph, state = _solve(sim)
    map_means = map_solution(graph, state)

    are_gbp = float(ba.avg_reprojection_error(graph, state, k=sim['k']))
    are_map = float(ba.avg_reprojection_error(graph, ba.with_means(state, map_means), k=sim['k']))
    assert abs(are_gbp - are_map) < 0.02, (are_gbp, are_map)

    got_lmk = np.asarray(state.v[ba.LMK].mean)
    map_lmk = np.asarray(map_means[ba.LMK])
    s, r, t = ba.align_sim3(got_lmk, map_lmk)
    aligned = ba.apply_sim3(s, r, t, got_lmk)
    assert np.abs(aligned - map_lmk).max() < 5e-3, np.abs(aligned - map_lmk).max()


def test_ba_f32_close_to_f64():
    sim = ba.simulate(n_cams=8, n_lmks=150, pix_sigma=1.0, seed=2)
    _, s64 = _solve(sim, dtype=jnp.float64)
    g32, s32 = _solve(sim, dtype=jnp.float32)
    are32 = float(ba.avg_reprojection_error(g32, s32, k=sim['k']))
    assert np.isfinite(np.asarray(s32.v[0].mean)).all()
    assert are32 < 1.4, are32


def test_ba_huber_rejects_outlier_observations():
    sim = ba.simulate(n_cams=12, n_lmks=300, pix_sigma=1.0, seed=3)
    rng = np.random.default_rng(0)
    m = sim["obs"].shape[0]
    idx = rng.choice(m, m // 20, replace=False)
    sim["obs"][idx] += rng.standard_normal((idx.size, 2)) * 80.0

    def solve(huber):
        graph, means = ba.build(sim, huber=huber, dtype=jnp.float64)
        state = init_state(graph, means)
        cfg = _ba_config()
        runj = jax.jit(run, static_argnums=3)
        for _ in range(8):
            state = runj(graph, state, cfg, 10)
            graph = ba.weaken_priors(graph, factor=0.3)
        state = runj(graph, state, cfg, 60)
        # Median reprojection error: robust to the (still-wrong) outlier obs.
        return float(jnp.median(ba.reprojection_errors_px(graph, state, sim['k'])))

    med_h = solve(huber=2.0)
    med_n = solve(huber=None)
    assert med_h < med_n, (med_h, med_n)
    assert med_h < 1.5, med_h
