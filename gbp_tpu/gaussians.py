"""Information-form Gaussian operations on batched arrays.

The single datatype of the whole engine (reference: `NdimGaussian` in
joeaortiz/gbp `gbp/gbp.py`; SURVEY.md C1): a Gaussian stored in canonical /
information form as (eta, lam) where lam = Sigma^-1 (precision) and
eta = lam @ mu (information vector).

Unlike the reference's one-object-per-Gaussian design, everything here is a pure
function over batched arrays `eta: [..., d]`, `lam: [..., d, d]` so whole blocks
of beliefs/messages/factors are processed by a few fused XLA ops (SURVEY.md §7).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gbp_tpu.utils.smalllinalg import bT, bmm, bmv, scaled_sym_inv, sym_inv, sym_solve


class Gaussian(NamedTuple):
    """Batched information-form Gaussian: eta [..., d], lam [..., d, d]."""

    eta: jnp.ndarray
    lam: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.eta.shape[-1]

    def __add__(self, other: "Gaussian") -> "Gaussian":
        """Product of Gaussian densities == addition in information form."""
        return Gaussian(self.eta + other.eta, self.lam + other.lam)

    def __sub__(self, other: "Gaussian") -> "Gaussian":
        """Division of densities (cavity computation)."""
        return Gaussian(self.eta - other.eta, self.lam - other.lam)

    def mean(self) -> jnp.ndarray:
        return sym_solve(self.lam, self.eta)

    def cov(self) -> jnp.ndarray:
        return sym_inv(self.lam)


def from_moments(mu: jnp.ndarray, sigma: jnp.ndarray) -> Gaussian:
    lam = sym_inv(sigma)
    return Gaussian(bmv(lam, mu), lam)


def isotropic(mu: jnp.ndarray, prec: jnp.ndarray) -> Gaussian:
    """Gaussian with mean mu and isotropic precision `prec` (broadcast scalar)."""
    d = mu.shape[-1]
    eye = jnp.eye(d, dtype=mu.dtype)
    lam = jnp.asarray(prec)[..., None, None] * eye
    return Gaussian(jnp.asarray(prec)[..., None] * mu, lam)


def packed_identity_row(d: int, dtype=jnp.float32) -> jnp.ndarray:
    """The padded-belief convention shared by the CM/halo paths: one packed
    (eta | lam | mean) row with eta = 0, lam = I, mean = 0 — keeps cavity
    inverses finite for structurally-dead slots while contributing nothing.
    Single source of truth for the [2d + d^2] packing layout's pad row."""
    return jnp.concatenate(
        [jnp.zeros(d), jnp.eye(d).reshape(-1), jnp.zeros(d)]
    ).astype(dtype)


def zeros(shape, d: int, dtype=jnp.float32) -> Gaussian:
    """All-zero (fully uninformative) Gaussian batch."""
    shape = tuple(shape)
    return Gaussian(
        jnp.zeros(shape + (d,), dtype=dtype),
        jnp.zeros(shape + (d, d), dtype=dtype),
    )


def marginalize(eta: jnp.ndarray, lam: jnp.ndarray, keep_start: int, keep_dim: int) -> Gaussian:
    """Marginalize a joint info-form Gaussian onto a contiguous block.

    Given joint (eta [..., t], lam [..., t, t]) returns the marginal over
    dims [keep_start : keep_start+keep_dim] via the Schur complement:

        lam_m = lam_aa - lam_ab lam_bb^-1 lam_ba
        eta_m = eta_a - lam_ab lam_bb^-1 eta_b

    (reference: Factor.compute_messages in joeaortiz/gbp gbp/gbp.py;
    eq. (13-16) of arXiv:1910.14139).  keep_start/keep_dim must be static.
    """
    t = eta.shape[-1]
    ks, kd = keep_start, keep_dim
    if t == kd:
        # Unary joint: already the marginal.
        return Gaussian(eta, lam)
    # Permute kept block to the front (static permutation).
    perm = list(range(ks, ks + kd)) + [i for i in range(t) if not ks <= i < ks + kd]
    eta_p = eta[..., perm]
    lam_p = lam[..., perm, :][..., :, perm]

    eta_a = eta_p[..., :kd]
    eta_b = eta_p[..., kd:]
    lam_aa = lam_p[..., :kd, :kd]
    lam_ab = lam_p[..., :kd, kd:]
    lam_bb = lam_p[..., kd:, kd:]

    bb_inv = scaled_sym_inv(lam_bb, t - kd)  # Jacobi-normalized: f32-safe
    w = bmm(lam_ab, bb_inv)                               # [..., kd, t-kd]
    lam_m = lam_aa - bmm(w, bT(lam_ab))
    eta_m = eta_a - bmv(w, eta_b)
    return Gaussian(eta_m, lam_m)
