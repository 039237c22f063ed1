"""The fused Pallas message kernel must reproduce the XLA covariance-form
update (gbp_tpu/ops/messages_pallas.py; interpret mode on the CPU backend)."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.schedules import run_wildfire
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba, pose_graph

CFG_KW = dict(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)


def _compare(graph, means, cfg_ref, cfg_pal, n=15, atol=1e-4):
    state = init_state(graph, means)
    ref = jax.jit(run, static_argnums=3)(graph, state, cfg_ref, n)
    pal = jax.jit(run, static_argnums=3)(graph, state, cfg_pal, n)
    for a, b in zip(ref.v, pal.v):
        np.testing.assert_allclose(
            np.asarray(pal_mean := b.mean), np.asarray(a.mean), atol=atol,
            err_msg="pallas vs covariance means diverged",
        )
    return ref, pal


def test_pallas_matches_covariance_ba():
    sim = ba.simulate(n_cams=6, n_lmks=80, seed=0)
    graph, means = ba.build(sim, dtype=jnp.float32)
    _compare(
        graph, means,
        GBPConfig(message_form="covariance", **CFG_KW),
        GBPConfig(message_form="pallas", **CFG_KW),
    )


def test_pallas_matches_covariance_ba_huber():
    sim = ba.simulate(n_cams=6, n_lmks=80, seed=1)
    graph, means = ba.build(sim, huber=2.0, dtype=jnp.float32)
    _compare(
        graph, means,
        GBPConfig(message_form="covariance", **CFG_KW),
        GBPConfig(message_form="pallas", **CFG_KW),
    )


def test_pallas_pose_graph_full_information():
    # g2o-style pose graphs carry full [z, z] measurement information.
    sim = pose_graph.simulate_manhattan(n_poses=40, seed=2, loop_prob=0.4)
    graph, means = pose_graph.build(sim, dtype=jnp.float32)
    # Promote the odometry block to full information matrices.
    fb = graph.fblocks[0]
    prec_full = jnp.zeros((fb.count, 3, 3), jnp.float32).at[
        :, jnp.arange(3), jnp.arange(3)
    ].set(fb.prec)
    graph = graph.replace(
        fblocks=(fb.replace(prec=prec_full),) + graph.fblocks[1:]
    )
    cfg_kw = dict(eta_damping=0.4, lam_damping=0.4, num_undamped_iters=3,
                  min_linear_iters=5, beta=0.05)
    _compare(
        graph, means,
        GBPConfig(message_form="covariance", **cfg_kw),
        GBPConfig(message_form="pallas", **cfg_kw),
        n=10,
    )


def test_pallas_wildfire_mask():
    sim = ba.simulate(n_cams=5, n_lmks=50, seed=3)
    graph, means = ba.build(sim, dtype=jnp.float32)
    state = init_state(graph, means)
    cfg_ref = GBPConfig(message_form="covariance", **CFG_KW)
    cfg_pal = GBPConfig(message_form="pallas", **CFG_KW)
    ref = jax.jit(run_wildfire, static_argnums=3)(graph, state, cfg_ref, 12, 1e-4)
    pal = jax.jit(run_wildfire, static_argnums=3)(graph, state, cfg_pal, 12, 1e-4)
    for a, b in zip(ref.v, pal.v):
        # 5e-4: the fused in-kernel relinearization rounds its trig slightly
        # differently from the XLA path; trajectories track but not bitwise.
        np.testing.assert_allclose(np.asarray(b.mean), np.asarray(a.mean), atol=5e-4)
