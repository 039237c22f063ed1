"""The 'covariance' (Woodbury) message form must equal the reference's
'schur' form exactly (f64) — they are algebraically identical."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba, pose_graph


def _cfgs(**kw):
    return (
        GBPConfig(message_form="covariance", **kw),
        GBPConfig(message_form="schur", **kw),
    )


def test_forms_agree_on_ba():
    sim = ba.simulate(n_cams=6, n_lmks=80, seed=0)
    graph, means = ba.build(sim, dtype=jnp.float64)
    cov_cfg, schur_cfg = _cfgs(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    runj = jax.jit(run, static_argnums=3)
    s_cov = runj(graph, init_state(graph, means), cov_cfg, 30)
    s_schur = runj(graph, init_state(graph, means), schur_cfg, 30)
    for vi in range(2):
        np.testing.assert_allclose(
            np.asarray(s_cov.v[vi].mean), np.asarray(s_schur.v[vi].mean),
            rtol=1e-6, atol=1e-8,
        )
    np.testing.assert_allclose(
        np.asarray(s_cov.f[0].msg_lam[0]), np.asarray(s_schur.f[0].msg_lam[0]),
        rtol=1e-5, atol=1e-8,
    )


def test_pallas_honors_cavity_jitter():
    """The fused Pallas path must apply GBPConfig.cavity_jitter like the
    'covariance' form (it was silently ignored before; ADVICE round 1)."""
    sim = ba.simulate(n_cams=5, n_lmks=40, seed=3)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="ell")
    runj = jax.jit(run, static_argnums=3)
    kw = dict(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
              cavity_jitter=1e-3)
    s_cov = runj(graph, init_state(graph, means),
                 GBPConfig(message_form="covariance", **kw), 12)
    s_pal = runj(graph, init_state(graph, means),
                 GBPConfig(message_form="pallas", **kw), 12)
    for vi in range(2):
        np.testing.assert_allclose(
            np.asarray(s_cov.v[vi].mean), np.asarray(s_pal.v[vi].mean),
            rtol=1e-6, atol=1e-9,
        )
    # With jitter=0 the trajectories differ from the jittered ones — i.e. the
    # knob actually reaches the kernel.
    s_pal0 = runj(graph, init_state(graph, means),
                  GBPConfig(message_form="pallas", eta_damping=0.4,
                            num_undamped_iters=6, min_linear_iters=8), 12)
    delta = np.abs(np.asarray(s_pal0.v[0].mean) - np.asarray(s_pal.v[0].mean)).max()
    assert delta > 1e-12, delta


def test_forms_agree_on_pose_graph():
    sim = pose_graph.simulate_manhattan(n_poses=40, seed=4, loop_prob=0.5, loop_radius=3.0)
    graph, means = pose_graph.build(sim, dtype=jnp.float64)
    cov_cfg, schur_cfg = _cfgs(
        eta_damping=0.4, lam_damping=0.4, num_undamped_iters=3, min_linear_iters=5,
        beta=0.05,
    )
    runj = jax.jit(run, static_argnums=3)
    s_cov = runj(graph, init_state(graph, means), cov_cfg, 50)
    s_schur = runj(graph, init_state(graph, means), schur_cfg, 50)
    np.testing.assert_allclose(
        np.asarray(s_cov.v[0].mean), np.asarray(s_schur.v[0].mean),
        rtol=1e-6, atol=1e-8,
    )
