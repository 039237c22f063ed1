"""CM fast path under halo partitioning (gbp_tpu/parallel/halo_cm.py):
per-chip ELL/CM sweeps + halo exchange must match the single-device CM sweep
and the generic halo path (f64, interpret-mode kernels on the CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core import sweep_cm
from gbp_tpu.core.sweep import GBPConfig
from gbp_tpu.models import ba, pose_graph
from gbp_tpu.parallel import halo, halo_cm, sharding

CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                message_form="pallas")


def _corridor(n_cams=16, lmks_per_cam=8, seed=3):
    sim = ba.simulate_corridor(n_cams=n_cams, lmks_per_cam=lmks_per_cam,
                               window=2, seed=seed)
    return ba.build(sim, dtype=jnp.float64, layout="none",
                    cam_prior_prec=1000.0, lmk_prior_prec=1000.0)


def test_halo_cm_matches_single_device_cm():
    graph, means = _corridor()
    # single-device CM reference needs the ELL layout build of the same sim
    sim = ba.simulate_corridor(n_cams=16, lmks_per_cam=8, window=2, seed=3)
    g_ell, m_ell = ba.build(sim, dtype=jnp.float64, layout="ell",
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    cmg = sweep_cm.prepare(g_ell, segsum_exact=True)
    assert cmg is not None
    s_ref = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, m_ell), CFG, 10)

    mesh = sharding.make_mesh(8)
    out = halo_cm.distribute(graph, means, mesh)
    assert out is not None
    hp, hcm, st, run_fn = out
    st = run_fn(hcm, st, CFG, 10)
    got = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(
            got[vbi], np.asarray(s_ref.v[vbi].mean), rtol=1e-7, atol=1e-9)


def test_halo_cm_matches_generic_halo():
    graph, means = _corridor(n_cams=12, lmks_per_cam=6, seed=4)
    mesh = sharding.make_mesh(8)
    hp_g, st_g, run_g = halo.distribute(graph, means, mesh)
    out_g = run_g(hp_g.hgraph, st_g, CFG, 8)
    want = halo.collect_means(hp_g, out_g)

    out = halo_cm.distribute(graph, means, mesh)
    assert out is not None
    hp, hcm, st, run_fn = out
    st = run_fn(hcm, st, CFG, 8)
    got = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(got[vbi], want[vbi], rtol=1e-7, atol=1e-9)


def test_halo_cm_pose_graph_matches_single_device_cm():
    """Same-block between factors under halo_cm (round 3): the two slots'
    partial sums combine before one exchange; per-factor huber rides in the
    prec operand.  Must match the single-device CM run."""
    sim = pose_graph.simulate_manhattan(n_poses=120, seed=4, loop_prob=0.5,
                                        loop_radius=3.0)
    cfg = pose_graph.default_config()
    graph, means = pose_graph.build(sim, dtype=jnp.float64)
    g_ell, m_ell = pose_graph.build(sim, dtype=jnp.float64, layout="ell")
    cmg = sweep_cm.prepare(g_ell, segsum_exact=True)
    single = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, m_ell), cfg, 25)

    mesh = sharding.make_mesh(8)
    out = halo_cm.distribute(graph, means, mesh)
    assert out is not None
    hp, hcm, st, run_fn = out
    assert hcm.vb_e == hcm.vb_g and hcm.huber == "row"
    st = run_fn(hcm, st, cfg, 25)
    got = halo.collect_means(
        hp, halo.HaloState(v=st.v, ghost=st.ghost, f=None))
    np.testing.assert_allclose(got[0], np.asarray(single.v[0].mean),
                               atol=1e-9, rtol=0)


def test_halo_cm_ineligible_full_precision():
    """Full (non-diagonal) measurement information stays on the generic
    halo path."""
    from test_se3_pose_graph import simulate_se3

    data = simulate_se3(n_poses=24, seed=0)
    data["edges_info"][0, 0, 1] = 0.1  # break exact diagonality
    graph, means = pose_graph.build_g2o(data, dtype=jnp.float64)
    assert graph.fblocks[0].prec.ndim == 3
    mesh = sharding.make_mesh(8)
    assert halo_cm.distribute(graph, means, mesh) is None


def test_halo_cm_weaken_priors():
    graph, means = _corridor(n_cams=12, lmks_per_cam=6, seed=5)
    mesh = sharding.make_mesh(8)
    hp, hcm, st, run_fn = halo_cm.distribute(graph, means, mesh)
    st = run_fn(hcm, st, CFG, 5)
    hp = halo.weaken_priors(hp, 0.1)
    hcm = hcm.replace(vblocks=hp.hgraph.vblocks)
    st = run_fn(hcm, st, CFG, 5)

    # generic halo with the same schedule must agree
    hp_g, st_g, run_g = halo.distribute(graph, means, mesh)
    st_g = run_g(hp_g.hgraph, st_g, CFG, 5)
    hp_g = halo.weaken_priors(hp_g, 0.1)
    st_g = run_g(hp_g.hgraph, st_g, CFG, 5)
    want = halo.collect_means(hp_g, st_g)
    got = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(got[vbi], want[vbi], rtol=1e-7, atol=1e-9)


def test_halo_cm_windowed_matches_single_device():
    """Per-chip camera windows under halo_cm (VERDICT r3 item 3): the
    partition-time locality ordering (halo.partition order_keys) plus the
    owned-window/ghost-table blocked kernels must reproduce the
    single-device windowed CM run.  2 chips x 640 owned cams each so the
    per-chip window gate engages."""
    sim = ba.simulate_blocks(n_blocks=32, n_cams=40, lmks_per_cam=8,
                             window=3, seed=0, shuffle=True)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none",
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    g_ell, m_ell = ba.build(sim, dtype=jnp.float64, layout="ell",
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    cmg = sweep_cm.prepare(g_ell, segsum_exact=True, window=True)
    assert cmg is not None and cmg.win_w > 0
    ref = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, m_ell), CFG, 8)
    ref_means = sweep_cm.to_gbp_state(cmg, ref)

    mesh = sharding.make_mesh(2)
    out = halo_cm.distribute(graph, means, mesh, window=True)
    assert out is not None
    hp, hcm, st, run_fn = out
    assert hcm.win_w > 0, "per-chip window gate must engage at 640 cams/chip"
    st = run_fn(hcm, st, CFG, 8)
    got = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(
            got[vbi], np.asarray(ref_means.v[vbi].mean),
            rtol=1e-7, atol=1e-9)
