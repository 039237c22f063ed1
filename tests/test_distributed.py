"""Multi-chip SPMD sweeps on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded execution must match single-device execution to tolerance."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba, pose_graph
from gbp_tpu.parallel import sharding


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_ba_matches_single_device():
    sim = ba.simulate(n_cams=8, n_lmks=120, seed=0)
    graph, means = ba.build(sim, dtype=jnp.float64)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    state = init_state(graph, means)

    single = jax.jit(run, static_argnums=3)(graph, state, cfg, 40)

    mesh = sharding.make_mesh(8)
    g_sh, s_sh = sharding.distribute(graph, state, mesh)
    multi = jax.jit(run, static_argnums=3)(g_sh, s_sh, cfg, 40)

    np.testing.assert_allclose(
        np.asarray(multi.v[ba.CAM].mean), np.asarray(single.v[ba.CAM].mean),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(multi.v[ba.LMK].mean), np.asarray(single.v[ba.LMK].mean),
        rtol=1e-9, atol=1e-11,
    )


def test_distributed_pose_graph_matches_single_device():
    sim = pose_graph.simulate_manhattan(n_poses=60, seed=4, loop_prob=0.5, loop_radius=3.0)
    graph, means = pose_graph.build(sim, dtype=jnp.float64)
    cfg = pose_graph.default_config()
    state = init_state(graph, means)

    single = jax.jit(run, static_argnums=3)(graph, state, cfg, 30)
    mesh = sharding.make_mesh(8)
    g_sh, s_sh = sharding.distribute(graph, state, mesh)
    multi = jax.jit(run, static_argnums=3)(g_sh, s_sh, cfg, 30)

    np.testing.assert_allclose(
        np.asarray(multi.v[0].mean), np.asarray(single.v[0].mean),
        rtol=1e-9, atol=1e-11,
    )


def test_padding_dummies_are_inert():
    # Padding to 8 devices adds dummy factors; results must be identical to
    # the unpadded graph run on one device.
    sim = ba.simulate(n_cams=6, n_lmks=80, seed=1)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none")
    m = graph.fblocks[0].count
    assert m % 8 != 0  # ensure padding actually happens
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    state = init_state(graph, means)
    plain = jax.jit(run, static_argnums=3)(graph, state, cfg, 20)

    padded = sharding.pad_graph(graph, 8)
    assert padded.fblocks[0].count % 8 == 0
    p_state = init_state(padded, means)
    p_out = jax.jit(run, static_argnums=3)(padded, p_state, cfg, 20)

    np.testing.assert_allclose(
        np.asarray(p_out.v[0].mean), np.asarray(plain.v[0].mean),
        rtol=1e-12, atol=1e-12,
    )
