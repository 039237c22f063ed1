"""In-engine prior annealing (gbp_tpu/core/anneal.py): exact equivalence
with the reference's host-loop schedule, and f32 convergence on the
chain-structured corridor with the FULL default schedule (VERDICT r2 item 1
— previously the f32 recipe had to disable weakening)."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core import anneal
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba

CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)


def test_run_annealed_matches_host_loop_exactly():
    """damp_window=0 must reproduce the reference's driver loop (sweep
    `every`, weaken by `factor`, repeat) bit-for-bit."""
    sim = ba.simulate(n_cams=6, n_lmks=60, seed=0)
    graph, means = ba.build(sim, dtype=jnp.float64)
    runj = jax.jit(run, static_argnums=3)

    g, st = graph, init_state(graph, means)
    for _ in range(3):
        st = runj(g, st, CFG, 10)
        g = ba.weaken_priors(g, 0.1)
    ref = runj(g, st, CFG, 10)

    got = anneal.run_annealed(graph, init_state(graph, means), CFG, 40,
                              every=10, factor=0.1, times=3, damp_window=0)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_annealed_cm_matches_generic():
    sim = ba.simulate(n_cams=6, n_lmks=60, seed=1)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="ell")
    from gbp_tpu.core import sweep_cm

    cfg = CFG.replace(message_form="pallas")
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    assert cmg is not None
    ref = anneal.run_annealed(graph, init_state(graph, means), cfg, 30,
                              every=10, factor=0.1, times=2, damp_window=5)
    got = anneal.run_annealed_cm(cmg, sweep_cm.init_state(cmg, means), cfg,
                                 30, every=10, factor=0.1, times=2,
                                 damp_window=5)
    for vi in range(2):
        np.testing.assert_allclose(np.asarray(got.v[vi].mean),
                                   np.asarray(ref.v[vi].mean),
                                   rtol=1e-9, atol=1e-9)


def test_corridor_f32_full_default_schedule_converges():
    """The headline fix: 64-cam corridor, f32, the reference's FULL default
    weakening schedule (x0.1 every 10 sweeps, 3 times).  The in-engine
    post-weakening lambda-damping window keeps the chain oscillation from
    re-triggering; without it this scene drifts/oscillates in f32
    (docs/PERFORMANCE.md 'Chain-structured scenes')."""
    sim = ba.simulate_corridor(n_cams=64, lmks_per_cam=40, window=3, seed=0)
    graph, means = ba.build(sim, dtype=jnp.float32, layout="ell",
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    state = anneal.run_annealed(graph, init_state(graph, means), CFG, 80,
                                every=10, factor=0.1, times=3,
                                damp_window=10, damp_lam=0.4)
    are = float(ba.avg_reprojection_error(graph, state, k=sim["k"]))
    assert np.isfinite(are) and are < 1.5, are
    # and it must STAY converged (no late oscillation onset)
    state = anneal.run_annealed(graph, state, CFG, 40, every=10, factor=0.1,
                                times=0, damp_window=0)
    are2 = float(ba.avg_reprojection_error(graph, state, k=sim["k"]))
    assert np.isfinite(are2) and are2 < 1.5, (are, are2)


def test_corridor_f32_halo_annealed():
    """The same schedule under halo partitioning (the flagship multi-chip
    scene), f32, 8 virtual chips."""
    from gbp_tpu.parallel import halo, sharding

    sim = ba.simulate_corridor(n_cams=32, lmks_per_cam=12, window=2, seed=2)
    graph, means = ba.build(sim, dtype=jnp.float32, layout="none",
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    mesh = sharding.make_mesh(8)
    hp, st, _ = halo.distribute(graph, means, mesh)
    run_fn = anneal.make_run_annealed_halo(mesh, hp, st)
    st = run_fn(hp.hgraph, st, CFG, 60, 10, 0.1, 3, 10, 0.4)
    got = halo.collect_means(hp, st)
    metric = init_state(graph, means)
    ref = ba.with_means(metric, tuple(jnp.asarray(m) for m in got))
    are = float(ba.avg_reprojection_error(graph, ref, k=sim["k"]))
    assert np.isfinite(are) and are < 1.5, are
