"""Component-major small-matrix algebra for Pallas TPU kernels.

Inside a kernel the efficient layout for "millions of tiny matrices" is the
transpose of the engine's [m, d, d] storage: each matrix COMPONENT is one 2D
tile of factors ((sublane, lane) = a block of the batch), and a d x d matrix
is a Python list-of-lists of d*d such tiles.  Every operation is then a plain
full-width VPU op; no >2D arrays ever exist, so Mosaic never pads tiny
trailing dims to (8, 128) vregs (which would blow up VMEM ~50x).

This mirrors gbp_tpu/utils/smalllinalg.py (same closed forms, same Jacobi
normalization) with matrices as `[[arr]*d]*d` instead of [..., d, d] arrays.
Matrices are plain nested lists; vectors are lists; scalars are arrays of the
tile shape.  All dims are static Python ints, everything fully unrolled.
"""
from __future__ import annotations

import jax.numpy as jnp


def cmat(rows):
    return [list(r) for r in rows]


def ct(a):
    """Transpose a component matrix."""
    return [[a[i][j] for i in range(len(a))] for j in range(len(a[0]))]


def cmm(a, b):
    """Matrix product: [r x k] @ [k x c]."""
    r, k, c = len(a), len(b), len(b[0])
    return [
        [sum(a[i][s] * b[s][j] for s in range(k)) for j in range(c)]
        for i in range(r)
    ]


def cmv(a, v):
    """Matrix-vector product: [r x k] @ [k]."""
    return [sum(a[i][s] * v[s] for s in range(len(v))) for i in range(len(a))]


def cadd(a, b):
    return [[x + y for x, y in zip(ra, rb)] for ra, rb in zip(a, b)]


def csub(a, b):
    return [[x - y for x, y in zip(ra, rb)] for ra, rb in zip(a, b)]


def cscale(a, s):
    return [[x * s for x in r] for r in a]


def vadd(u, v):
    return [x + y for x, y in zip(u, v)]


def vsub(u, v):
    return [x - y for x, y in zip(u, v)]


def vscale(u, s):
    return [x * s for x in u]


def csym(a):
    d = len(a)
    return [[0.5 * (a[i][j] + a[j][i]) for j in range(d)] for i in range(d)]


def _inv2(a):
    det = a[0][0] * a[1][1] - a[0][1] * a[0][1]
    inv_det = 1.0 / det
    return [
        [a[1][1] * inv_det, -a[0][1] * inv_det],
        [-a[0][1] * inv_det, a[0][0] * inv_det],
    ]


def _inv3(a):
    c00 = a[1][1] * a[2][2] - a[1][2] * a[1][2]
    c01 = a[0][2] * a[1][2] - a[0][1] * a[2][2]
    c02 = a[0][1] * a[1][2] - a[0][2] * a[1][1]
    c11 = a[0][0] * a[2][2] - a[0][2] * a[0][2]
    c12 = a[0][1] * a[0][2] - a[0][0] * a[1][2]
    c22 = a[0][0] * a[1][1] - a[0][1] * a[0][1]
    det = a[0][0] * c00 + a[0][1] * c01 + a[0][2] * c02
    inv_det = 1.0 / det
    return [
        [c00 * inv_det, c01 * inv_det, c02 * inv_det],
        [c01 * inv_det, c11 * inv_det, c12 * inv_det],
        [c02 * inv_det, c12 * inv_det, c22 * inv_det],
    ]


def csym_inv(a):
    """Symmetric inverse: closed forms d<=3, 2x2-block Schur recursion above
    (same split as smalllinalg._sym_inv_fn: d1 = ceil(d/2))."""
    d = len(a)
    if d == 1:
        return [[1.0 / a[0][0]]]
    if d == 2:
        return _inv2(a)
    if d == 3:
        return _inv3(a)
    d1 = (d + 1) // 2
    p = [[a[i][j] for j in range(d1)] for i in range(d1)]
    q = [[a[i][j] for j in range(d1, d)] for i in range(d1)]
    s = [[a[i][j] for j in range(d1, d)] for i in range(d1, d)]
    p_inv = csym_inv(p)
    pq = cmm(p_inv, q)
    schur_inv = csym_inv(csub(s, cmm(ct(q), pq)))
    tr = cscale(cmm(pq, schur_inv), -1.0)
    tl = cadd(p_inv, cmm(cmm(pq, schur_inv), ct(pq)))
    out = [[None] * d for _ in range(d)]
    for i in range(d1):
        for j in range(d1):
            out[i][j] = tl[i][j]
        for j in range(d - d1):
            out[i][d1 + j] = tr[i][j]
            out[d1 + j][i] = tr[i][j]
    for i in range(d - d1):
        for j in range(d - d1):
            out[d1 + i][d1 + j] = schur_inv[i][j]
    return out


def cscaled_sym_inv(a, eps=1e-30):
    """f32-safe inverse: Jacobi-normalize to unit diagonal, invert, undo
    (mirrors smalllinalg.scaled_sym_inv)."""
    d = len(a)
    if d == 1:
        return [[1.0 / a[0][0]]]
    s = [jnp.sqrt(jnp.maximum(a[i][i], eps)) for i in range(d)]
    a_n = [[a[i][j] / (s[i] * s[j]) for j in range(d)] for i in range(d)]
    inv_n = csym_inv(a_n)
    return [[inv_n[i][j] / (s[i] * s[j]) for j in range(d)] for i in range(d)]
