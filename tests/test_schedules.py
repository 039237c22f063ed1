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


# --- CM fast-path variants (VERDICT r2 item 5) ----------------------------


def _ba_ell(seed=0):
    from gbp_tpu.models import ba

    sim = ba.simulate(n_cams=6, n_lmks=50, seed=seed)
    return ba.build(sim, dtype=jnp.float64, layout="ell"), sim


def test_wildfire_cm_matches_generic():
    from gbp_tpu.core import schedules, sweep_cm

    (graph, means), _ = _ba_ell(seed=3)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    assert cmg is not None
    ref = jax.jit(schedules.run_wildfire, static_argnums=3)(
        graph, init_state(graph, means), cfg, 15, 1e-4)
    got = jax.jit(schedules.run_wildfire_cm, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, means), cfg, 15, 1e-4)
    for vi in range(2):
        np.testing.assert_allclose(np.asarray(got.v[vi].mean),
                                   np.asarray(ref.v[vi].mean),
                                   rtol=1e-9, atol=1e-9)


def test_priority_cm_matches_generic():
    from gbp_tpu.core import schedules, sweep_cm

    (graph, means), _ = _ba_ell(seed=4)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    assert cmg is not None
    ref = jax.jit(schedules.run_priority, static_argnums=(3, 4))(
        graph, init_state(graph, means), cfg, 20, 0.5)
    got = jax.jit(schedules.run_priority_cm, static_argnums=(3, 4))(
        cmg, sweep_cm.init_state(cmg, means), cfg, 20, 0.5)
    for vi in range(2):
        np.testing.assert_allclose(np.asarray(got.v[vi].mean),
                                   np.asarray(ref.v[vi].mean),
                                   rtol=1e-8, atol=1e-8)


def test_random_cm_converges():
    from gbp_tpu.core import schedules, sweep_cm
    from gbp_tpu.models import ba

    (graph, means), sim = _ba_ell(seed=5)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    state = jax.jit(schedules.run_random_cm, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, means), cfg, 100, 0.7,
        jax.random.key(0))
    are = float(ba.avg_reprojection_error(
        graph, sweep_cm.to_gbp_state(cmg, state), k=sim["k"]))
    assert np.isfinite(are) and are < 1.5, are
