"""Linear factor types (exactness sanity checks + toy problems).

Reference parity: joeaortiz/gbp `gbp/factors/linear_displacement.py`
(SURVEY.md C8) — h(x) = x_j - x_i with J = [-I, I].  On graphs built purely
from linear factors GBP is exact at convergence (arXiv:2107.02308 §2.4), which
the test suite uses as its strongest invariant.
"""
from __future__ import annotations

import jax.numpy as jnp

from gbp_tpu.factors.base import FactorType


def displacement(dof: int) -> FactorType:
    """h([x_i, x_j]) = x_j - x_i  (measures the displacement between two vars)."""

    def meas(x, args):
        del args
        return x[dof:] - x[:dof]

    def jac(x, args):
        del args
        eye = jnp.eye(dof, dtype=x.dtype)
        return jnp.concatenate([-eye, eye], axis=-1)

    return FactorType(name=f"displacement{dof}", zdim=dof, meas_fn=meas, jac_fn=jac, linear=True)


def observation(dof: int) -> FactorType:
    """Unary direct observation h(x) = x (a soft anchor / GPS-style factor)."""

    def meas(x, args):
        del args
        return x

    def jac(x, args):
        del args
        return jnp.eye(dof, dtype=x.dtype)

    return FactorType(name=f"observation{dof}", zdim=dof, meas_fn=meas, jac_fn=jac, linear=True)


def height_1d() -> FactorType:
    """1D line-fitting style unary measurement of a scalar variable.

    Used by the 1D toy config (BASELINE.json configs[0]).
    """
    return observation(1)
