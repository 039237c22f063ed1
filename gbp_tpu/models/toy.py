"""1D line-fitting toy problem (BASELINE.json configs[0]).

The reference's linear sanity config (SURVEY.md §4.2, arXiv:2107.02308 §2):
a chain of scalar "height" variables with smoothness (displacement) factors
and noisy unary measurements.  GBP is exact here — the convergence curve must
hit the dense-MAP solution to machine precision.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.graph import GraphBuilder
from gbp_tpu.factors import linear


def simulate(n=50, obs_sigma=0.3, smooth_sigma=0.1, seed=0):
    """Smooth 1D signal + noisy observations."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(0.0, 4 * np.pi, n)
    truth = np.sin(xs) + 0.3 * xs
    obs = truth + obs_sigma * rng.standard_normal(n)
    return dict(truth=truth, obs=obs, obs_sigma=obs_sigma, smooth_sigma=smooth_sigma)


def build(sim: dict, prior_prec=1e-4, dtype=jnp.float32):
    """Build the toy graph; returns (graph, init_means)."""
    obs = np.asarray(sim["obs"], dtype=np.float64)
    n = obs.shape[0]
    b = GraphBuilder(dtype=dtype)
    v = b.add_variables("height", np.zeros((n, 1)), prior_prec=prior_prec)
    b.add_factors(
        "obs", linear.observation(1), [(v, np.arange(n))], obs[:, None],
        sigma=sim["obs_sigma"],
    )
    b.add_factors(
        "smooth",
        linear.displacement(1),
        [(v, np.arange(n - 1)), (v, np.arange(1, n))],
        np.zeros((n - 1, 1)),
        sigma=sim["smooth_sigma"],
    )
    return b.build()
