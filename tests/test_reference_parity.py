"""Algorithmic parity with the reference implementation.

gbp_tpu/bench/numpy_gbp.py is a faithful serial re-implementation of
joeaortiz/gbp's algorithm (object graph, per-factor Python loops, dense Schur
message marginalization — SURVEY.md §3.1).  The TPU engine must produce the
SAME per-sweep trajectory on the same problem with the same knobs: identical
relinearization decisions, damping schedule, and message algebra (the
covariance form is algebraically identical to the reference's Schur form).
"""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.bench.numpy_gbp import build_ba_numpy
from gbp_tpu.core.sweep import GBPConfig, init_state, sweep
from gbp_tpu.models import ba

KNOBS = dict(eta_damping=0.4, beta=0.01, min_linear_iters=8, num_undamped_iters=6)


def _np_means(g, n_cams):
    cams = np.stack([v.mean for v in g.variables[:n_cams]])
    lmks = np.stack([v.mean for v in g.variables[n_cams:]])
    return cams, lmks


def test_engine_matches_reference_impl_per_sweep():
    n_cams = 6
    sim = ba.simulate(n_cams=n_cams, n_lmks=60, seed=0)
    # Match numpy_gbp's prior structure: only camera 0 anchored.
    graph, means = ba.build(
        sim, anchor_prec=(1e5, 1.0), cam_prior_prec=1.0, lmk_prior_prec=1.0,
        dtype=jnp.float64, layout="none",
    )
    state = init_state(graph, means)
    # The 'schur' form is the reference's exact formulation; 'covariance' is
    # algebraically identical but rounds differently (and better) in the
    # cancellation-heavy marginalization, so we compare the schur form.
    # Residual ~1e-7..1e-5 transients are the marginalization's own f64
    # cancellation noise (prec ~2.5e5 terms cancelling to O(1) cavities).
    cfg = GBPConfig(message_form="schur", **KNOBS)
    sweep_j = jax.jit(sweep)

    g_np = build_ba_numpy(sim)
    for it in range(12):
        g_np.synchronous_iteration(**KNOBS)
        state = sweep_j(graph, state, cfg)
        np_cams, np_lmks = _np_means(g_np, n_cams)
        np.testing.assert_allclose(
            np.asarray(state.v[ba.CAM].mean), np_cams, atol=1e-4,
            err_msg=f"camera means diverged from reference impl at sweep {it}",
        )
        np.testing.assert_allclose(
            np.asarray(state.v[ba.LMK].mean), np_lmks, atol=1e-4,
            err_msg=f"landmark means diverged from reference impl at sweep {it}",
        )
