"""Persistent component-major sweep (core/sweep_cm.py): parity with the
row-major pallas path, eligibility fallbacks, and the segsum kernel.

Runs in interpret mode on the CPU mesh (f64); the on-chip twin checks live in
tests/tpu/."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core import sweep_cm
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba, pose_graph


def _ba_graph(n_cams=6, n_lmks=50, seed=0):
    sim = ba.simulate(n_cams=n_cams, n_lmks=n_lmks, seed=seed)
    return ba.build(sim, dtype=jnp.float64, layout="ell"), sim


def test_cm_matches_pallas_path():
    (graph, means), sim = _ba_graph()
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    assert cmg is not None
    s_ref = jax.jit(run, static_argnums=3)(graph, init_state(graph, means), cfg, 15)
    s_cm = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, means), cfg, 15)
    for vi in range(2):
        np.testing.assert_allclose(
            np.asarray(s_cm.v[vi].mean), np.asarray(s_ref.v[vi].mean),
            rtol=1e-9, atol=1e-9)
    g = sweep_cm.to_gbp_state(cmg, s_cm)
    for k in range(2):
        np.testing.assert_allclose(
            np.asarray(g.f[0].msg_eta[k]), np.asarray(s_ref.f[0].msg_eta[k]),
            rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(g.f[0].msg_lam[k]), np.asarray(s_ref.f[0].msg_lam[k]),
            rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(
        np.asarray(g.f[0].since_relin), np.asarray(s_ref.f[0].since_relin))
    np.testing.assert_allclose(
        np.asarray(g.f[0].linpoint), np.asarray(s_ref.f[0].linpoint),
        rtol=1e-12, atol=1e-12)


def test_cm_gather_modes_agree():
    (graph, means), _ = _ba_graph(n_cams=5, n_lmks=30, seed=2)
    cfg = GBPConfig(message_form="pallas")
    outs = []
    for mode in ("rows", "take1", "table"):
        cmg = sweep_cm.prepare(graph, gather_mode=mode, segsum_exact=True)
        assert cmg.gather_mode == mode
        outs.append(jax.jit(sweep_cm.run, static_argnums=3)(
            cmg, sweep_cm.init_state(cmg, means), cfg, 8))
    for o in outs[1:]:
        for vi in range(2):
            np.testing.assert_allclose(
                np.asarray(outs[0].v[vi].mean), np.asarray(o.v[vi].mean),
                rtol=1e-12, atol=1e-12)


def test_cm_prepare_fallbacks():
    # Pose graphs (no component-form measurement model) must be ineligible.
    sim = pose_graph.simulate_manhattan(n_poses=20, seed=0)
    graph, _ = pose_graph.build(sim)
    assert sweep_cm.prepare(graph) is None
    # A BA graph without ELL layout is ineligible too.
    bsim = ba.simulate(n_cams=4, n_lmks=20, seed=1)
    g_plain, _ = ba.build(bsim, layout="none")
    assert sweep_cm.prepare(g_plain) is None


def test_cm_virtual_padding_vars():
    """nv > n_lmks (padding up to lcm(TILE, deg)) must not perturb results."""
    (graph, means), _ = _ba_graph(n_cams=7, n_lmks=23, seed=5)
    fb = graph.fblocks[0]
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    n_e = graph.vblocks[fb.vblocks[fb.ell_slot]].count
    assert cmg.nv > n_e  # the padding case is actually exercised
    cfg = GBPConfig(message_form="pallas")
    s_ref = jax.jit(run, static_argnums=3)(graph, init_state(graph, means), cfg, 10)
    s_cm = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, means), cfg, 10)
    for vi in range(2):
        np.testing.assert_allclose(
            np.asarray(s_cm.v[vi].mean), np.asarray(s_ref.v[vi].mean),
            rtol=1e-9, atol=1e-9)


def test_segsum_cm_matches_segment_sum():
    from gbp_tpu.ops.messages_pallas import LANE, segsum_cm

    rng = np.random.default_rng(0)
    mp, d, n_seg = 2048, 3, 17
    me_rm = rng.standard_normal((mp, d))
    ml_rm = rng.standard_normal((mp, d * d))
    idx = rng.integers(0, n_seg, mp).astype(np.int32)
    to_cm = lambda a: jnp.swapaxes(jnp.asarray(a), 0, 1).reshape(
        a.shape[1], mp // LANE, LANE)
    out = segsum_cm(to_cm(me_rm), to_cm(ml_rm), to_cm(idx[:, None]).astype(jnp.int32),
                    n_seg=n_seg, exact=True, interpret=True)
    ref = np.zeros((n_seg, d + d * d))
    np.add.at(ref, idx, np.concatenate([me_rm, ml_rm], axis=1))
    np.testing.assert_allclose(np.asarray(out), ref.T, rtol=1e-10, atol=1e-10)


def test_cm_energy_and_are_work_on_cmstate():
    """Diagnostics accept CMState directly (they only read .v)."""
    from gbp_tpu.core.sweep import energy

    (graph, means), sim = _ba_graph(n_cams=5, n_lmks=30, seed=3)
    cmg = sweep_cm.prepare(graph)
    st = sweep_cm.init_state(cmg, means)
    cfg = GBPConfig(message_form="pallas")
    e0 = float(energy(graph, st))
    st = jax.jit(sweep_cm.run, static_argnums=3)(cmg, st, cfg, 20)
    e1 = float(energy(graph, st))
    assert np.isfinite(e1) and e1 < e0, (e0, e1)
    are = float(ba.avg_reprojection_error(graph, st, k=sim["k"]))
    assert np.isfinite(are)
