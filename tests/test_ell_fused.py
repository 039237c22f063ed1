"""In-kernel ELL-slot belief fusion (CMGraph.ell_fused) must be BITWISE
equal to the unfused paths: the one-hot reconstruction selects exactly one
table row and `_split_f32` keeps f32 values exact, so fused and unfused
sweeps may not differ in any bit of any state leaf (reference semantics:
SURVEY.md §3.1 compute_messages — this is a pure layout/fusion change).

Covers all four fused kernels (ops/messages_pallas.py *_tab_ell /
*_tabblk_ell x relin/messages): windowed + locality-sorted BA, full-table
BA at an aligned degree, and a same-block pose graph.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core import sweep_cm
from gbp_tpu.core.sweep import GBPConfig
from gbp_tpu.models import ba, pose_graph

CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                message_form="pallas")


def _assert_bitwise(cmg0, cmg1, means, cfg, n_sweeps):
    s0 = sweep_cm.init_state(cmg0, means)
    s1 = sweep_cm.init_state(cmg1, means)
    for _ in range(n_sweeps):
        s0 = sweep_cm.sweep(cmg0, s0, cfg)
        s1 = sweep_cm.sweep(cmg1, s1, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(s0),
                    jax.tree_util.tree_leaves(s1)):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_fused_matches_unfused_windowed_corridor():
    """Misaligned deg + camera windows + locality sort: exercises the
    *_tabblk_ell kernels against *_tabblk through relinearization."""
    sim = ba.simulate_corridor(n_cams=320, lmks_per_cam=20, window=3, seed=1)
    graph, means = ba.build(sim, layout="ell", dtype=jnp.float64,
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    cmg0 = sweep_cm.prepare(graph, window=True, ell_fused=False)
    cmg1 = sweep_cm.prepare(graph, window=True, ell_fused=True)
    assert cmg1.win_w > 0 and cmg1.ell_fused and not cmg0.ell_fused
    assert cmg1.fb.ell_deg == 6  # lane-misaligned: the slow-broadcast class
    _assert_bitwise(cmg0, cmg1, means, CFG, 10)


def test_fused_matches_unfused_aligned_deg():
    """LANE-aligned degree (the headline-bench class): the unfused path is
    the free XLA broadcast, the fused path the *_tab_ell kernels."""
    sim = ba.simulate(n_cams=8, n_lmks=120, seed=0)
    graph, means = ba.build(sim)
    cmg0 = sweep_cm.prepare(graph, segsum_exact=True, ell_fused=False)
    cmg1 = sweep_cm.prepare(graph, segsum_exact=True, ell_fused=True)
    assert cmg1.ell_fused and cmg1.win_w == 0
    assert 128 % cmg1.fb.ell_deg == 0
    _assert_bitwise(cmg0, cmg1, means, CFG, 12)


def test_fused_matches_unfused_under_halo():
    """The halo_cm per-chip sweep with fused ELL reconstruction (the
    *_tab_ell / *_tabblkg_ell kernels inside shard_map) must be bitwise
    equal to the unfused halo_cm run."""
    from gbp_tpu.parallel import halo_cm, sharding

    sim = ba.simulate_corridor(n_cams=16, lmks_per_cam=8, window=2, seed=3)
    graph, means = ba.build(sim, layout="none", cam_prior_prec=1000.0,
                            lmk_prior_prec=1000.0)
    mesh = sharding.make_mesh(4)
    outs = []
    for fused in (False, True):
        hp, hcm, st, run = halo_cm.distribute(graph, means, mesh,
                                              ell_fused=fused)
        assert hcm.ell_fused == (fused and hcm.gather_mode == "table"
                                 and hcm.ell_w2 > 0)
        outs.append(run(hcm, st, CFG, 8))
    for a, b in zip(jax.tree_util.tree_leaves(outs[0]),
                    jax.tree_util.tree_leaves(outs[1])):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_fused_matches_unfused_same_block_pose_graph():
    """Same-block 2-slot factors (pose graph): both slots reconstruct from
    the SAME variable block's tables."""
    psim = pose_graph.simulate_manhattan(n_poses=120, seed=1, loop_prob=0.3)
    pg, pm = pose_graph.build(psim, layout="ell")
    cfg = pose_graph.default_config()
    cmg0 = sweep_cm.prepare(pg, window=True, ell_fused=False)
    cmg1 = sweep_cm.prepare(pg, window=True, ell_fused=True)
    assert cmg1.ell_fused
    assert cmg1.fb.vblocks[0] == cmg1.fb.vblocks[1]
    _assert_bitwise(cmg0, cmg1, pm, cfg, 10)
