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


def test_halo_cm_ineligible_pose_graph():
    sim = pose_graph.simulate_manhattan(n_poses=24, seed=0)
    graph, means = pose_graph.build(sim, dtype=jnp.float64)
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
