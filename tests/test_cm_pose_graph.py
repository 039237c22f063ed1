"""Component-major fast path for pose graphs (round 3).

Pose-graph between factors connect two variables of the SAME block and use
a wrapped-angle residual; the CM engine (core/sweep_cm.py) supports both
via the same-block belief update (ELL reshape-sum + segsum onto one block)
and component residual functions in the COMP_FACTORS registry.  Merged
odometry+loop blocks mix robust and non-robust factors through per-factor
Huber thresholds riding in the prec operand.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core import sweep_cm
from gbp_tpu.core.sweep import init_state, run
from gbp_tpu.factors.odometry import se2_between
from gbp_tpu.models import pose_graph
from gbp_tpu.ops.comp_factors import se2_between_comp, se2_between_res


def _sim(n_poses=120, seed=4):
    return pose_graph.simulate_manhattan(n_poses=n_poses, seed=seed,
                                         loop_prob=0.5, loop_radius=3.0)


def test_se2_comp_jac_matches_autodiff():
    ft = se2_between()
    rng = np.random.default_rng(0)
    for _ in range(6):
        x = rng.standard_normal(6) * 2.0
        xj = jnp.asarray(x)
        h_ref = np.asarray(ft.meas(xj, None))
        j_ref = np.asarray(jax.jacfwd(ft.meas_fn)(xj, None))
        comps = [jnp.asarray(x[i]) for i in range(6)]
        h, jac = se2_between_comp(comps, None)
        np.testing.assert_allclose(np.asarray(jnp.stack(h)), h_ref,
                                   atol=1e-12)
        j = np.asarray(jnp.stack([jnp.stack(r) for r in jac]))
        np.testing.assert_allclose(j, j_ref, atol=1e-12)


def test_se2_comp_residual_wraps():
    z = [jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(3.1)]
    h = [jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(-3.1)]
    r = se2_between_res(z, h)
    # 6.2 rad wraps to ~ -0.083
    assert abs(float(r[2]) - (6.2 - 2 * np.pi)) < 1e-6


def test_merged_block_matches_two_blocks():
    """Per-factor Huber thresholds == the two-block build on the generic
    engine (identical per-factor updates; summation-order rounding only)."""
    sim = _sim()
    cfg = pose_graph.default_config()
    g1, m1 = pose_graph.build(sim, dtype=jnp.float64, merged=False)
    g2, m2 = pose_graph.build(sim, dtype=jnp.float64, merged=True)
    assert len(g1.fblocks) == 2 and len(g2.fblocks) == 1
    assert g2.fblocks[0].huber_arr is not None
    s1 = jax.jit(run, static_argnums=3)(g1, init_state(g1, m1), cfg, 25)
    s2 = jax.jit(run, static_argnums=3)(g2, init_state(g2, m2), cfg, 25)
    np.testing.assert_allclose(np.asarray(s2.v[0].mean),
                               np.asarray(s1.v[0].mean), atol=1e-9, rtol=0)


def test_cm_pose_graph_matches_generic():
    """Same-block CM sweeps (relin with wrapped residual, per-factor huber,
    combined belief update) == the generic engine, through relinearization."""
    sim = _sim()
    cfg = pose_graph.default_config()
    graph, means = pose_graph.build(sim, dtype=jnp.float64, layout="ell")
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    assert cmg is not None and cmg.gather_mode == "table"
    s_ref = jax.jit(run, static_argnums=3)(graph, init_state(graph, means),
                                           cfg, 25)
    s_cm = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, means), cfg, 25)
    np.testing.assert_allclose(np.asarray(s_cm.v[0].mean),
                               np.asarray(s_ref.v[0].mean),
                               atol=1e-9, rtol=0)


def test_cm_pose_graph_windowed():
    """Large pose graphs engage the window kernels (chain locality) and
    match the full-table CM path."""
    sim = _sim(n_poses=1500)
    cfg = pose_graph.default_config()
    graph, means = pose_graph.build(sim, dtype=jnp.float64, layout="ell")
    outs = {}
    for window in (False, True):
        cmg = sweep_cm.prepare(graph, window=window, segsum_exact=True)
        if window:
            assert 0 < cmg.win_w <= cmg.win_ncpad // 2
        outs[window] = jax.jit(sweep_cm.run, static_argnums=3)(
            cmg, sweep_cm.init_state(cmg, means), cfg, 20)
    np.testing.assert_allclose(np.asarray(outs[True].v[0].mean),
                               np.asarray(outs[False].v[0].mean),
                               atol=1e-8, rtol=0)


def test_cm_pose_graph_f32_converges():
    """The production dtype end-to-end: CM pose-graph run reduces ATE."""
    sim = _sim(n_poses=200, seed=1)
    cfg = pose_graph.default_config()
    graph, means = pose_graph.build(sim, layout="ell")  # f32
    cmg = sweep_cm.prepare(graph)
    assert cmg is not None
    ate0 = pose_graph.ate(np.asarray(means[0]), sim["truth"])
    st = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, means), cfg, 150)
    ate1 = pose_graph.ate(np.asarray(st.v[0].mean), sim["truth"])
    assert np.isfinite(ate1) and ate1 < 0.5 * ate0, (ate0, ate1)


def test_cm_se3_pose_graph_matches_generic():
    """SE(3) between factors on the CM path: the component-form analytic
    Jacobian + manifold-log residual + diagonal-info collapse in build_g2o
    reproduce the generic engine."""
    from test_se3_pose_graph import simulate_se3

    data = simulate_se3(n_poses=40, seed=3)
    cfg = pose_graph.default_config()
    graph, means = pose_graph.build_g2o(data, dtype=jnp.float64,
                                        layout="ell")
    assert graph.fblocks[0].prec.ndim == 2  # diagonal info collapsed
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    assert cmg is not None
    s_ref = jax.jit(run, static_argnums=3)(graph, init_state(graph, means),
                                           cfg, 25)
    s_cm = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, means), cfg, 25)
    np.testing.assert_allclose(np.asarray(s_cm.v[0].mean),
                               np.asarray(s_ref.v[0].mean),
                               atol=1e-9, rtol=0)


def test_se3_comp_jac_matches_autodiff():
    from gbp_tpu.factors.se3 import se3_between
    from gbp_tpu.ops.comp_factors import se3_between_comp, se3_between_res

    ft = se3_between()
    rng = np.random.default_rng(0)
    for i in range(8):
        x = rng.standard_normal(12) * (0.3 if i < 4 else 1.5)
        xj = jnp.asarray(x)
        h_ref = np.asarray(ft.meas(xj, None))
        j_ref = np.asarray(jax.jacfwd(ft.meas_fn)(xj, None))
        comps = [jnp.asarray(x[k]) for k in range(12)]
        h, jac = se3_between_comp(comps, None)
        np.testing.assert_allclose(np.asarray(jnp.stack(h)), h_ref,
                                   atol=1e-12)
        j = np.asarray(jnp.stack([jnp.stack(r) for r in jac]))
        np.testing.assert_allclose(j, j_ref, atol=1e-12)
    z = rng.standard_normal(6)
    h_ = rng.standard_normal(6)
    r_ref = np.asarray(ft.residual(jnp.asarray(z), jnp.asarray(h_)))
    r = se3_between_res([jnp.asarray(v) for v in z],
                        [jnp.asarray(v) for v in h_])
    np.testing.assert_allclose(np.asarray(jnp.stack(r)), r_ref, atol=1e-12)


def test_cm_pose_graph_wildfire_schedule():
    """The CM wildfire schedule composes with the same-block pose path:
    tau < 0 (everything active) must equal the synchronous sweep exactly —
    pins the schedule-mask plumbing through the merged-block kernels.
    (Thresholded-wildfire convergence semantics are pinned on linear graphs
    in test_schedules.py; on nonlinear loopy graphs a positive tau leaves
    O(tau)-stale messages and a slightly different fixed point by design.)"""
    from gbp_tpu.core import schedules

    sim = _sim(n_poses=48, seed=3)
    cfg = pose_graph.default_config()
    graph, means = pose_graph.build(sim, dtype=jnp.float64, layout="ell")
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    sync = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, means), cfg, 30)
    wf = jax.jit(schedules.run_wildfire_cm, static_argnums=(3,))(
        cmg, sweep_cm.init_state(cmg, means), cfg, 30, -1.0)
    np.testing.assert_allclose(np.asarray(wf.v[0].mean),
                               np.asarray(sync.v[0].mean),
                               atol=1e-12, rtol=0)


def test_cm_pose_graph_huber_rejects_outliers():
    """Per-factor huber actually robustifies: with outlier loop closures the
    huberized merged build beats the huber=None build on ATE (CM path)."""
    sim = pose_graph.simulate_manhattan(n_poses=150, seed=2, loop_prob=0.5,
                                        loop_radius=3.0, outlier_frac=0.15)
    cfg = pose_graph.default_config()
    ates = {}
    for huber in (None, 2.0):
        graph, means = pose_graph.build(sim, huber=huber,
                                        dtype=jnp.float64, layout="ell")
        cmg = sweep_cm.prepare(graph, segsum_exact=True)
        assert cmg is not None
        st = jax.jit(sweep_cm.run, static_argnums=3)(
            cmg, sweep_cm.init_state(cmg, means), cfg, 120)
        ates[huber] = pose_graph.ate(np.asarray(st.v[0].mean), sim["truth"])
    assert ates[2.0] < 0.7 * ates[None], ates
