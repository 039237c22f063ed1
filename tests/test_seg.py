"""Degree-class-segmented CM path (core/sweep_cm.prepare_seg): the ELL
pad-row attack must be a pure relayout — per-sweep trajectories match the
single-segment CM engine through relinearization, robustification, and
damping, and the GBPState round-trip is exact.

Reference analogue: none (the reference pads nothing because it loops over
Python factor objects — SURVEY.md C3/C4); this is TPU-layout machinery, so
its spec is the single-segment engine it must agree with.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core import sweep_cm
from gbp_tpu.core.sweep import GBPConfig
from gbp_tpu.models import ba


def _scene(n_cams=16, lpc=30):
    sim = ba.simulate_blocks(n_blocks=2, n_cams=n_cams, lmks_per_cam=lpc,
                             window=3, seed=0, shuffle=True)
    graph, means = ba.build(sim, layout="ell", cam_prior_prec=1000.0,
                            lmk_prior_prec=1000.0, dtype=jnp.float64)
    return sim, graph, means


CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                message_form="pallas")


def test_seg_matches_single_segment_trajectory():
    sim, graph, means = _scene()
    cmg = sweep_cm.prepare(graph, segsum_exact=True, window=True)
    sg = sweep_cm.prepare_seg(graph, segsum_exact=True, window=True,
                              classes_mode="exact")
    assert sg is not None and len(sg.parts) >= 2
    # each class's rows stop at the class degree (no global-max padding);
    # TILE alignment can still dominate at this toy scale, which is exactly
    # why the production "auto" DP declines small scenes (see
    # test_seg_run_dispatch_and_fallback)
    assert all(p.mp % p.deg == 0 for p in sg.parts)

    s1 = sweep_cm.init_state(cmg, means)
    s2 = sweep_cm.init_state(sg, means)
    for _ in range(4):
        s1 = sweep_cm.sweep(cmg, s1, CFG)
        s2 = sweep_cm.sweep(sg, s2, CFG)
    g1 = sweep_cm.to_gbp_state(cmg, s1)
    g2 = sweep_cm.to_gbp_state(sg, s2)
    for vi in range(2):
        np.testing.assert_allclose(np.asarray(g2.v[vi].mean),
                                   np.asarray(g1.v[vi].mean),
                                   rtol=1e-9, atol=1e-9)
    for k in range(2):
        a1 = np.asarray(g1.f[0].msg_eta[k])
        a2 = np.asarray(g2.f[0].msg_eta[k])
        assert np.abs(a1 - a2).max() <= 1e-9 * max(np.abs(a1).max(), 1.0)
    np.testing.assert_array_equal(np.asarray(g2.f[0].linpoint),
                                  np.asarray(g1.f[0].linpoint))
    # clone rows carry zero messages (fb.valid invariant)
    valid = np.asarray(graph.fblocks[0].valid)
    assert np.all(np.asarray(g2.f[0].msg_eta[0])[~valid] == 0.0)


def test_seg_gbp_state_roundtrip_exact():
    _, graph, means = _scene()
    sg = sweep_cm.prepare_seg(graph, segsum_exact=True, window=True,
                              classes_mode="exact")
    s = sweep_cm.init_state(sg, means)
    for _ in range(3):
        s = sweep_cm.sweep(sg, s, CFG)
    s2 = sweep_cm.from_gbp_state(sg, sweep_cm.to_gbp_state(sg, s))
    a = sweep_cm.sweep(sg, s, CFG)
    b = sweep_cm.sweep(sg, s2, CFG)
    for vi in range(2):
        np.testing.assert_array_equal(np.asarray(a.v[vi].mean),
                                      np.asarray(b.v[vi].mean))


def test_seg_run_dispatch_and_fallback():
    _, graph, means = _scene()
    # default prepare(segment=True) on a small scene: the DP declines
    # (alignment + dispatch overhead beats the pad saving) and the call
    # falls back to the single-segment CMGraph — same entry points.
    cmg = sweep_cm.prepare(graph, segsum_exact=True, window=True,
                           segment=True)
    assert isinstance(cmg, sweep_cm.CMGraph)
    # forced seg graph rides run() via the dispatcher
    sg = sweep_cm.prepare_seg(graph, segsum_exact=True, window=True,
                              classes_mode="exact")
    s = sweep_cm.init_state(sg, means)
    out = jax.jit(sweep_cm.run, static_argnums=3)(sg, s, CFG, 2)
    assert np.isfinite(np.asarray(out.v[0].mean)).all()
