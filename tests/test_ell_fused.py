"""In-kernel ELL-slot belief fusion (CMGraph.ell_fused) vs the unfused
paths.  The belief RECONSTRUCTION is value-identical (the one-hot selects
exactly one table row; `_split_f32` keeps f32 exact) and the folded
gathered-slot segment-sum mirrors the standalone kernels bit for bit
(pinned in test_folded_segsum_matches_standalone).  Two effects still keep
whole-sweep trajectories from being bitwise: the folded ELL group-sum
reorders the summation vs the sequential reshape-sum (~1e-13 relative
f64), and growing the message kernel changes XLA-CPU's FMA/fusion grouping
by ULPs — and the beta-threshold relinearization amplifies any ULP
chaotically on knife-edge graphs.  So the trajectory checks here pin tight
tolerances over a relinearizing run (the same class as
tests/test_table_window.py), plus exact internal-consistency checks of the
folds (reference semantics: SURVEY.md §3.1 compute_messages — all of this
is layout/fusion, not math changes).
"""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core import sweep_cm
from gbp_tpu.core.sweep import GBPConfig
from gbp_tpu.models import ba, pose_graph

CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                message_form="pallas")


def _assert_close(cmg0, cmg1, means, cfg, n_sweeps, atol):
    s0 = sweep_cm.init_state(cmg0, means)
    s1 = sweep_cm.init_state(cmg1, means)
    for _ in range(n_sweeps):
        s0 = sweep_cm.sweep(cmg0, s0, cfg)
        s1 = sweep_cm.sweep(cmg1, s1, cfg)
    for v0, v1 in zip(s0.v, s1.v):
        np.testing.assert_allclose(np.asarray(v1.mean), np.asarray(v0.mean),
                                   atol=atol, rtol=0)


def test_fused_matches_unfused_windowed_corridor():
    """Misaligned deg + camera windows + locality sort: exercises the
    *_tabblk_ell kernels against *_tabblk through relinearization.

    NOT a bitwise check: growing the message kernel (the folded segsum
    partials add dot consumers of its outputs) changes XLA-CPU's FMA/fusion
    grouping inside the message math by ULPs, and the corridor's
    beta-threshold relinearization amplifies any ULP chaotically.  The
    folded REDUCTION itself is pinned bitwise in
    test_folded_segsum_matches_standalone; here we pin the trajectory at
    the same tolerance class as test_table_window.py."""
    sim = ba.simulate_corridor(n_cams=320, lmks_per_cam=20, window=3, seed=1)
    graph, means = ba.build(sim, layout="ell", dtype=jnp.float64,
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    cmg0 = sweep_cm.prepare(graph, window=True, ell_fused=False)
    cmg1 = sweep_cm.prepare(graph, window=True, ell_fused=True)
    assert cmg1.win_w > 0 and cmg1.ell_fused and not cmg0.ell_fused
    assert cmg1.fb.ell_deg == 6  # lane-misaligned: the slow-broadcast class
    s0 = sweep_cm.init_state(cmg0, means)
    s1 = sweep_cm.init_state(cmg1, means)
    for _ in range(15):
        s0 = sweep_cm.sweep(cmg0, s0, CFG)
        s1 = sweep_cm.sweep(cmg1, s1, CFG)
    for vi in range(2):
        np.testing.assert_allclose(np.asarray(s1.v[vi].mean),
                                   np.asarray(s0.v[vi].mean),
                                   atol=1e-4, rtol=0)
    are0 = float(ba.avg_reprojection_error(graph, sweep_cm.to_gbp_state(cmg0, s0)))
    are1 = float(ba.avg_reprojection_error(graph, sweep_cm.to_gbp_state(cmg1, s1)))
    assert abs(are0 - are1) < 1e-4, (are0, are1)


def test_folded_segsum_matches_standalone():
    """The segsum partials folded into the fused message kernels must equal
    the standalone segsum kernels EXACTLY on the same messages: recompute
    the gathered-slot belief from the sweep's own message outputs with
    segsum_cm_blk and compare to the beliefs the sweep produced."""
    from gbp_tpu.ops.messages_pallas import segsum_cm_blk

    sim = ba.simulate_corridor(n_cams=320, lmks_per_cam=20, window=3, seed=1)
    graph, means = ba.build(sim, layout="ell", dtype=jnp.float64,
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    cmg = sweep_cm.prepare(graph, window=True, ell_fused=True)
    assert cmg.win_w > 0 and cmg.ell_fused
    fb = cmg.fb
    gs = 1 - fb.ell_slot
    st = sweep_cm.sweep(cmg, sweep_cm.init_state(cmg, means), CFG)
    me_g, ml_g = st.f.msg_eta[gs], st.f.msg_lam[gs]
    vb_g = cmg.base.vblocks[fb.vblocks[gs]]
    ref = segsum_cm_blk(me_g, ml_g, cmg.gidx_cm, cmg.win_starts,
                        n_seg=vb_g.count, w=cmg.win_w, exact=True,
                        interpret=True)
    d_g = fb.dofs[gs]
    eta_g = vb_g.prior_eta + jnp.swapaxes(ref[:d_g], 0, 1)
    got = st.v[fb.vblocks[gs]].eta
    assert float(jnp.max(jnp.abs(eta_g - got))) == 0.0


def test_fused_matches_unfused_aligned_deg():
    """LANE-aligned degree (the headline-bench class): the unfused path is
    the free XLA broadcast, the fused path the *_tab_ell kernels."""
    sim = ba.simulate(n_cams=8, n_lmks=120, seed=0)
    graph, means = ba.build(sim, dtype=jnp.float64)
    cmg0 = sweep_cm.prepare(graph, segsum_exact=True, ell_fused=False)
    cmg1 = sweep_cm.prepare(graph, segsum_exact=True, ell_fused=True)
    assert cmg1.ell_fused and cmg1.win_w == 0
    assert 128 % cmg1.fb.ell_deg == 0
    _assert_close(cmg0, cmg1, means, CFG, 30, atol=1e-6)


def test_fused_matches_unfused_under_halo():
    """The halo_cm per-chip sweep with fused ELL reconstruction (the
    *_tab_ell / *_tabblkg_ell kernels inside shard_map) must be bitwise
    equal to the unfused halo_cm run."""
    from gbp_tpu.parallel import halo_cm, sharding

    sim = ba.simulate_corridor(n_cams=16, lmks_per_cam=8, window=2, seed=3)
    graph, means = ba.build(sim, layout="none", dtype=jnp.float64,
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    mesh = sharding.make_mesh(4)
    outs = []
    for fused in (False, True):
        hp, hcm, st, run = halo_cm.distribute(graph, means, mesh,
                                              ell_fused=fused)
        assert hcm.ell_fused == (fused and hcm.gather_mode == "table"
                                 and hcm.ell_w2 > 0)
        outs.append(run(hcm, st, CFG, 8))
    for v0, v1 in zip(outs[0].v, outs[1].v):
        np.testing.assert_allclose(np.asarray(v1.mean), np.asarray(v0.mean),
                                   atol=1e-6, rtol=0)


def test_fused_matches_unfused_same_block_pose_graph():
    """Same-block 2-slot factors (pose graph): both slots reconstruct from
    the SAME variable block's tables."""
    psim = pose_graph.simulate_manhattan(n_poses=120, seed=1, loop_prob=0.3)
    pg, pm = pose_graph.build(psim, layout="ell", dtype=jnp.float64)
    cfg = pose_graph.default_config()
    cmg0 = sweep_cm.prepare(pg, window=True, ell_fused=False)
    cmg1 = sweep_cm.prepare(pg, window=True, ell_fused=True)
    assert cmg1.ell_fused
    assert cmg1.fb.vblocks[0] == cmg1.fb.vblocks[1]
    _assert_close(cmg0, cmg1, pm, cfg, 30, atol=1e-6)
