"""Explicit shard_map SPMD sweeps (gbp_tpu/parallel/spmd.py) on the 8-device
virtual CPU mesh: keyframe-partitioned factors + psum halo must reproduce the
single-device result exactly (same math, different factor order)."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba, pose_graph
from gbp_tpu.parallel import sharding, spmd


def _single(graph, means, cfg, n):
    state = init_state(graph, means)
    return jax.jit(run, static_argnums=3)(graph, state, cfg, n)


def test_spmd_ba_matches_single_device():
    sim = ba.simulate(n_cams=8, n_lmks=120, seed=0)
    graph, means = ba.build(sim, dtype=jnp.float64)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    single = _single(graph, means, cfg, 30)

    mesh = sharding.make_mesh(8)
    g_sh, s_sh = spmd.distribute(graph, means, mesh)
    run_spmd = spmd.make_run(mesh, g_sh, s_sh)
    multi = run_spmd(g_sh, s_sh, cfg, 30)

    for vs_m, vs_s in zip(multi.v, single.v):
        np.testing.assert_allclose(
            np.asarray(vs_m.mean), np.asarray(vs_s.mean), rtol=1e-9, atol=1e-11
        )


def test_spmd_pose_graph_matches_single_device():
    sim = pose_graph.simulate_manhattan(n_poses=64, seed=4, loop_prob=0.5,
                                        loop_radius=3.0)
    graph, means = pose_graph.build(sim, dtype=jnp.float64)
    cfg = pose_graph.default_config()
    single = _single(graph, means, cfg, 25)

    mesh = sharding.make_mesh(8)
    g_sh, s_sh = spmd.distribute(graph, means, mesh)
    run_spmd = spmd.make_run(mesh, g_sh, s_sh)
    multi = run_spmd(g_sh, s_sh, cfg, 25)

    np.testing.assert_allclose(
        np.asarray(multi.v[0].mean), np.asarray(single.v[0].mean),
        rtol=1e-9, atol=1e-11,
    )


def test_partition_balances_and_preserves_factors():
    sim = ba.simulate(n_cams=8, n_lmks=100, seed=2)
    graph, means = ba.build(sim)
    p = spmd.partition_graph(graph, 4)
    for fb_old, fb_new in zip(graph.fblocks, p.fblocks):
        assert fb_new.count % 4 == 0
        valid_old = (np.ones(fb_old.count, bool) if fb_old.valid is None
                     else np.asarray(fb_old.valid))
        assert int(fb_new.valid.sum()) == int(valid_old.sum())
        # Every original (valid) measurement appears exactly once among the
        # partitioned graph's valid rows.
        z_old = np.sort(np.asarray(fb_old.z)[valid_old], axis=0)
        z_new = np.sort(np.asarray(fb_new.z)[np.asarray(fb_new.valid)], axis=0)
        np.testing.assert_array_equal(z_old, z_new)
