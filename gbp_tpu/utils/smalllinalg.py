"""Closed-form batched small symmetric-matrix linear algebra.

GBP's hot op is per-factor Schur marginalization of tiny (<= 9x9 for BA) dense
symmetric systems, batched over 1e3..1e6 factors.  TPU's vector unit (VPU) eats
elementwise formulas over the batch dimension; LAPACK-style batched factorizations
do not map well.  So we build inverses/solves of symmetric positive-definite
matrices of *static* small dimension from fully unrolled closed forms:

  d = 1      : reciprocal
  d = 2, 3   : adjugate / cofactor expansion
  d >= 4     : recursive 2x2-block Schur complement, splitting d = ceil(d/2)+rest,
               bottoming out at the closed forms.

Everything is expressed with `...` leading batch dims so the same functions work
under vmap, inside jit, and inside Pallas kernels (elementwise ops only).

Reference parity: the upstream repo (joeaortiz/gbp, `gbp/gbp.py`
Factor.compute_messages) uses np.linalg.inv on the marginalized block; we replace
it with these closed forms for TPU friendliness.  See SURVEY.md C3/C4.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bmm(a, b):
    """Batched tiny-matrix product [..., i, k] x [..., k, j] -> [..., i, j].

    Written as broadcast-multiply + sum (NOT jnp.matmul/einsum) deliberately:
    XLA lowers dots to the MXU, whose f32 default on TPU is single-pass bf16
    (8-bit mantissa) — numerically fatal for this engine's cancellation-heavy
    algebra — and whose 128x128 tiles are ~99% padding for d <= 9 operands.
    The VPU runs this form in true f32 and XLA fuses the sum, so it is both
    exact and faster here.
    """
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def bmv(a, v):
    """Batched tiny matrix-vector product [..., i, k] x [..., k] -> [..., i]."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def bvm(v, a):
    """Batched tiny vector-matrix product [..., k] x [..., k, j] -> [..., j]."""
    return jnp.sum(v[..., :, None] * a, axis=-2)


def bT(a):
    return jnp.swapaxes(a, -1, -2)


def _inv1(a):
    return 1.0 / a


def sym_inv2(a):
    """Inverse of [..., 2, 2] symmetric matrices."""
    a00 = a[..., 0, 0]
    a01 = a[..., 0, 1]
    a11 = a[..., 1, 1]
    det = a00 * a11 - a01 * a01
    inv_det = 1.0 / det
    row0 = jnp.stack([a11 * inv_det, -a01 * inv_det], axis=-1)
    row1 = jnp.stack([-a01 * inv_det, a00 * inv_det], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def sym_inv3(a):
    """Inverse of [..., 3, 3] symmetric matrices via adjugate."""
    a00 = a[..., 0, 0]
    a01 = a[..., 0, 1]
    a02 = a[..., 0, 2]
    a11 = a[..., 1, 1]
    a12 = a[..., 1, 2]
    a22 = a[..., 2, 2]
    # Cofactors (symmetric input -> symmetric inverse).
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / det
    row0 = jnp.stack([c00, c01, c02], axis=-1)
    row1 = jnp.stack([c01, c11, c12], axis=-1)
    row2 = jnp.stack([c02, c12, c22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


@functools.lru_cache(maxsize=None)
def _sym_inv_fn(d: int):
    if d < 1:
        raise ValueError(f"sym_inv needs d >= 1, got {d}")
    if d == 1:
        return lambda a: _inv1(a)
    if d == 2:
        return sym_inv2
    if d == 3:
        return sym_inv3

    d1 = (d + 1) // 2
    d2 = d - d1
    inv_p = _sym_inv_fn(d1)
    inv_s = _sym_inv_fn(d2)

    def inv(a):
        # A = [[P, Q], [Q^T, S]];  block-Schur inverse.
        p = a[..., :d1, :d1]
        q = a[..., :d1, d1:]
        s = a[..., d1:, d1:]
        p_inv = inv_p(p)
        pq = bmm(p_inv, q)                  # [..., d1, d2]
        schur = s - bmm(bT(q), pq)
        schur_inv = inv_s(schur)
        top_right = -bmm(pq, schur_inv)      # [..., d1, d2]
        top_left = p_inv + bmm(bmm(pq, schur_inv), bT(pq))
        bottom_left = bT(top_right)
        top = jnp.concatenate([top_left, top_right], axis=-1)
        bottom = jnp.concatenate([bottom_left, schur_inv], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    return inv


def sym_inv(a, d: int | None = None):
    """Inverse of [..., d, d] symmetric (PD-ish) matrices, closed-form unrolled.

    `d` must be a static int (defaults to a.shape[-1]).
    """
    if d is None:
        d = a.shape[-1]
    if a.shape[-1] != d or a.shape[-2] != d:
        raise ValueError(f"expected [..., {d}, {d}], got {a.shape}")
    if d == 1:
        return 1.0 / a
    return _sym_inv_fn(d)(a)


def sym_solve(a, b):
    """Solve A x = b for symmetric [..., d, d] A and [..., d] b."""
    d = a.shape[-1]
    if d == 1:
        return b / a[..., 0]
    inv = sym_inv(a, d)
    return bmv(inv, b)


def symmetrize(a):
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def _jacobi_scale(a):
    """d = sqrt(diag(a)) clamped away from zero; for D^-1 A D^-1 normalization."""
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    return jnp.sqrt(jnp.maximum(diag, jnp.asarray(1e-30, dtype=a.dtype)))


def scaled_sym_inv(a, d: int | None = None):
    """f32-safe inverse: Jacobi-normalize (unit diagonal), invert, un-normalize.

    GBP joint blocks mix precisions spanning ~1e10 dynamic range (strong gauge
    anchors x focal-length-squared reprojection terms); the raw adjugate
    cofactor products overflow/cancel in f32.  D^-1 (D^-1 A D^-1)^-1 D^-1 is
    algebraically identical and keeps intermediates O(1).
    """
    if d is None:
        d = a.shape[-1]
    if d == 1:
        return 1.0 / a
    s = _jacobi_scale(a)
    a_n = a / (s[..., :, None] * s[..., None, :])
    inv_n = sym_inv(a_n, d)
    return inv_n / (s[..., :, None] * s[..., None, :])


def scaled_sym_solve(a, b):
    """f32-safe solve via Jacobi-normalized inverse."""
    d = a.shape[-1]
    if d == 1:
        return b / a[..., 0]
    s = _jacobi_scale(a)
    a_n = a / (s[..., :, None] * s[..., None, :])
    inv_n = sym_inv(a_n, d)
    return bmv(inv_n, b / s) / s
