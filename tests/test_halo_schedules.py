"""Schedules under the halo-sharded paths (parallel/schedules.py, VERDICT r3
item 4): wildfire masks must reproduce the single-device schedule runs;
priority/random masked runs must reach the same fixed point (arXiv:2107.02308
§3.5 — GBP converges under arbitrary lossy schedules); and a chip that
computes NOTHING for a stretch of sweeps (dropped halo exchanges / dead
chip) must only delay convergence — the papers' fault-tolerance story under
real partitioning (SURVEY.md §5 'failure detection')."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core import schedules as sched_1chip
from gbp_tpu.core import sweep_cm
from gbp_tpu.core.oracle import map_solution
from gbp_tpu.core.sweep import GBPConfig, init_state
from gbp_tpu.models import ba
from gbp_tpu.parallel import halo, halo_cm, sharding
from gbp_tpu.parallel import schedules as sched

from tests.test_sweep_linear import build_chain

LIN_CFG = GBPConfig(eta_damping=0.0, num_undamped_iters=0, min_linear_iters=1)
CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                message_form="pallas")


def _corridor(n_cams=12, lmks_per_cam=6, seed=4, layout="none"):
    sim = ba.simulate_corridor(n_cams=n_cams, lmks_per_cam=lmks_per_cam,
                               window=2, seed=seed)
    return ba.build(sim, dtype=jnp.float64, layout=layout,
                    cam_prior_prec=1000.0, lmk_prior_prec=1000.0)


def test_wildfire_halo_matches_single_device():
    graph, means = _corridor()
    ref = jax.jit(sched_1chip.run_wildfire, static_argnums=3)(
        graph, init_state(graph, means), CFG, 12, 1e-4)

    mesh = sharding.make_mesh(8)
    hp, st, _ = halo.distribute(graph, means, mesh)
    run_wf = sched.make_run_wildfire(mesh, hp, st)
    st = run_wf(hp.hgraph, st, CFG, 12, 1e-4)
    got = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(
            got[vbi], np.asarray(ref.v[vbi].mean), rtol=1e-7, atol=1e-9)


def test_priority_halo_converges_to_map():
    graph, means = build_chain(seed=2)
    mesh = sharding.make_mesh(4)
    hp, st, _ = halo.distribute(graph, means, mesh)
    run_pr = sched.make_run_priority(mesh, hp, st, frac=0.5)
    st = run_pr(hp.hgraph, st, LIN_CFG, 200)
    got = halo.collect_means(hp, st)
    expected = map_solution(graph, init_state(graph, means))[0]
    np.testing.assert_allclose(got[0], np.asarray(expected), atol=1e-6)


def test_random_halo_converges_to_map():
    graph, means = build_chain(seed=6)
    mesh = sharding.make_mesh(4)
    hp, st, _ = halo.distribute(graph, means, mesh)
    run_rand = sched.make_run_random(mesh, hp, st)
    st = run_rand(hp.hgraph, st, LIN_CFG, 250, 0.7, jax.random.key(0))
    got = halo.collect_means(hp, st)
    expected = map_solution(graph, init_state(graph, means))[0]
    np.testing.assert_allclose(got[0], np.asarray(expected), atol=1e-6)


def test_chip_dropout_recovers():
    """Chip 1 is dead (all its factors inactive -> its boundary messages go
    stale exactly as if its exchanges were dropped) for the first 40 sweeps,
    then rejoins: the run still reaches the dense-MAP fixed point."""
    graph, means = build_chain(n=16, seed=3)
    mesh = sharding.make_mesh(4)
    hp, st, _ = halo.distribute(graph, means, mesh)
    run_dd = sched.make_run_chip_dropout(mesh, hp, st)
    st = run_dd(hp.hgraph, st, LIN_CFG, 200, 1, 40)
    got = halo.collect_means(hp, st)
    expected = map_solution(graph, init_state(graph, means))[0]
    np.testing.assert_allclose(got[0], np.asarray(expected), atol=1e-6)


# --- CM fast path under halo ----------------------------------------------


def test_wildfire_halo_cm_matches_single_device_cm():
    graph, means = _corridor(seed=5)
    g_ell, m_ell = _corridor(seed=5, layout="ell")
    cmg = sweep_cm.prepare(g_ell, segsum_exact=True)
    assert cmg is not None
    ref = jax.jit(sched_1chip.run_wildfire_cm, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, m_ell), CFG, 12, 1e-4)

    mesh = sharding.make_mesh(8)
    out = halo_cm.distribute(graph, means, mesh)
    assert out is not None
    hp, hcm, st, _ = out
    run_wf = sched.make_run_wildfire_cm(mesh, hcm, st)
    st = run_wf(hcm, st, CFG, 12, 1e-4)
    got = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(
            got[vbi], np.asarray(ref.v[vbi].mean), rtol=1e-7, atol=1e-9)


def test_priority_halo_cm_converges():
    """Priority scheduling trades staleness for per-sweep selectivity, so it
    approaches the synchronous fixed point SLOWLY on the relinearizing BA
    problem (measured: max|diff| 0.89 -> 0.027 over ~450 sweeps at frac=0.5;
    0.027 at frac=0.75/120).  Assert the converging trend at a tolerance
    with ~2x headroom rather than sweep for minutes in interpret mode."""
    graph, means = _corridor(seed=6)
    mesh = sharding.make_mesh(4)
    out = halo_cm.distribute(graph, means, mesh)
    assert out is not None
    hp, hcm, st, run_sync = out
    ref = run_sync(hcm, st, CFG, 60)
    want = halo.collect_means(hp, ref)
    run_pr = sched.make_run_priority_cm(mesh, hcm, st, frac=0.75)
    st = run_pr(hcm, st, CFG, 120)
    got = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(got[vbi], want[vbi], atol=5e-2)


def test_chip_dropout_cm_recovers():
    """Dead-chip fault injection on the CM halo path: chip 0 silent for the
    first 15 sweeps, then the run re-approaches the synchronous answer.
    The nonlinear corridor re-converges slowly after the outage (measured
    max|diff| 3.6e-2 at sweep 90, shrinking with more sweeps), so assert
    recovery at 150 sweeps at a tolerance with
    headroom — the exact-convergence version of this property is pinned on
    the linear chain (test_chip_dropout_recovers, atol 1e-6)."""
    graph, means = _corridor(seed=7)
    mesh = sharding.make_mesh(4)
    out = halo_cm.distribute(graph, means, mesh)
    assert out is not None
    hp, hcm, st, run_sync = out
    ref = run_sync(hcm, st, CFG, 60)
    want = halo.collect_means(hp, ref)
    run_dd = sched.make_run_chip_dropout_cm(mesh, hcm, st)
    st = run_dd(hcm, st, CFG, 150, 0, 15)
    got = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(got[vbi], want[vbi], atol=5e-2)
