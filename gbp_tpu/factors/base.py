"""Measurement-model interface for factors.

The engine is measurement-model-agnostic (reference: joeaortiz/gbp passes
`meas_fn` / `jac_fn` callables into the generic `Factor`; SURVEY.md C3/L2).
Here a factor type is a small object with pure functions:

  meas(x, args)      -> z_hat [zdim]        (h(x) in the papers)
  jac(x, args)       -> J [zdim, tdof]      (default: jax.jacfwd of meas)
  residual(z, z_hat) -> r [zdim]            (default: z - z_hat; SE(2) wraps angle)

where x is the concatenated state of the factor's adjacent variables [tdof] and
`args` is a pytree of per-factor parameters (e.g. camera intrinsics).  The graph
engine vmaps these over the factor batch; no Python loops over factors exist
anywhere.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FactorType:
    """A measurement model h(x) with optional analytic Jacobian.

    Attributes:
      name: label for debugging / block naming.
      zdim: measurement dimension.
      meas_fn: h(x, args) -> [zdim].
      jac_fn: J(x, args) -> [zdim, tdof]; None => forward-mode autodiff.
      residual_fn: r(z, z_hat) -> [zdim]; None => z - z_hat.
      linear: True if h is affine in x (a single linearization is exact, so the
        engine can skip relinearization entirely for this block).
    """

    name: str
    zdim: int
    meas_fn: Callable[[jnp.ndarray, Any], jnp.ndarray]
    jac_fn: Callable[[jnp.ndarray, Any], jnp.ndarray] | None = None
    residual_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None
    linear: bool = False

    def meas(self, x, args):
        return self.meas_fn(x, args)

    def jac(self, x, args):
        if self.jac_fn is not None:
            return self.jac_fn(x, args)
        return jax.jacfwd(self.meas_fn)(x, args)

    def residual(self, z, z_hat):
        if self.residual_fn is not None:
            return self.residual_fn(z, z_hat)
        return z - z_hat
