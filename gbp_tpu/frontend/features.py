"""Feature detection + matching in JAX (north-star frontend).

The reference repo has no frontend (SURVEY.md §2 — BAL files arrive with
correspondences precomputed); the north star requires "feature
detection+matching" feeding GBP bundle adjustment [BASELINE.json].  This
module provides the minimal TPU-friendly pipeline:

  * Harris corner response (separable Gaussian window + Sobel gradients,
    pure lax.conv — batches onto the MXU/VPU),
  * non-maximum suppression via max-pool equality + top-k selection
    (static shapes: always returns max_corners, with validity scores),
  * bilinear patch descriptors and zero-normalized cross-correlation (ZNCC)
    matching as one [N1, N2] matmul on the MXU with mutual-nearest +
    ratio-test filtering.

All functions are jittable with static output shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gauss_kernel(sigma: float, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _sep_conv(img, kx, ky):
    """Separable 2D convolution with 'same' padding (img [H, W])."""
    img4 = img[None, None]
    out = jax.lax.conv_general_dilated(
        img4, kx[None, None, None, :], (1, 1),
        [(0, 0), (kx.shape[0] // 2, kx.shape[0] // 2)],
    )
    out = jax.lax.conv_general_dilated(
        out, ky[None, None, :, None], (1, 1),
        [(ky.shape[0] // 2, ky.shape[0] // 2), (0, 0)],
    )
    return out[0, 0]


def harris_response(img, sigma: float = 1.5, k: float = 0.04):
    """Harris corner response map for img [H, W] (float)."""
    img = img.astype(jnp.float32)
    sobel = jnp.array([-0.5, 0.0, 0.5], dtype=jnp.float32)
    smooth = jnp.array([0.25, 0.5, 0.25], dtype=jnp.float32)
    ix = _sep_conv(img, sobel, smooth)
    iy = _sep_conv(img, smooth, sobel)
    g = _gauss_kernel(sigma, radius=max(1, int(2 * sigma)))
    sxx = _sep_conv(ix * ix, g, g)
    syy = _sep_conv(iy * iy, g, g)
    sxy = _sep_conv(ix * iy, g, g)
    det = sxx * syy - sxy * sxy
    trace = sxx + syy
    return det - k * trace * trace


@functools.partial(jax.jit, static_argnames=("max_corners", "nms_radius", "border"))
def detect(img, max_corners: int = 256, nms_radius: int = 4, border: int = 8):
    """Harris corners: returns (xy [max_corners, 2] float, score [max_corners]).

    Static output size; weak/absent corners have score <= 0 (callers filter).
    xy is (col, row) = (u, v) pixel coordinates.
    """
    resp = harris_response(img)
    h, w = resp.shape
    win = 2 * nms_radius + 1
    pooled = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (win, win), (1, 1), "SAME"
    )
    is_max = (resp == pooled) & (resp > 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (
        (rows >= border) & (rows < h - border)
        & (cols >= border) & (cols < w - border)
    )
    score = jnp.where(is_max & inside, resp, -jnp.inf).reshape(-1)
    top, idx = jax.lax.top_k(score, max_corners)
    yy = (idx // w).astype(jnp.float32)
    xx = (idx % w).astype(jnp.float32)
    return jnp.stack([xx, yy], axis=-1), top


@functools.partial(jax.jit, static_argnames=("size",))
def extract_patches(img, xy, size: int = 9):
    """Bilinear patch descriptors at subpixel centers xy [N, 2] -> [N, size*size],
    zero-normalized (ZNCC-ready: mean-subtracted, unit norm)."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    r = size // 2
    dy, dx = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        indexing="ij",
    )

    def one(p):
        gx = jnp.clip(p[0] + dx, 0.0, w - 1.001)
        gy = jnp.clip(p[1] + dy, 0.0, h - 1.001)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        fx = gx - x0
        fy = gy - y0
        v = (
            img[y0, x0] * (1 - fx) * (1 - fy)
            + img[y0, x0 + 1] * fx * (1 - fy)
            + img[y0 + 1, x0] * (1 - fx) * fy
            + img[y0 + 1, x0 + 1] * fx * fy
        )
        v = v.reshape(-1)
        v = v - jnp.mean(v)
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-6)

    return jax.vmap(one)(xy)


@functools.partial(jax.jit, static_argnames=("min_score", "ratio", "max_disp"))
def match(desc1, desc2, valid1=None, valid2=None, xy1=None, xy2=None,
          min_score: float = 0.7, ratio: float = 0.9,
          max_disp: float | None = None):
    """ZNCC brute-force matching: returns (match_idx [N1] int32, ok [N1] bool).

    match_idx[i] = best j in desc2 for descriptor i; ok requires mutual
    nearest neighbors, ZNCC >= min_score, and Lowe ratio (best/second) test.
    With xy1/xy2 and max_disp set, candidates farther than max_disp pixels
    are excluded (the standard small-motion tracking gate — essential when
    appearance alone is ambiguous).  The [N1, N2] similarity is one matmul
    (MXU).
    """
    sim = desc1 @ desc2.T  # ZNCC in [-1, 1]
    if valid1 is not None:
        sim = jnp.where(valid1[:, None], sim, -2.0)
    if valid2 is not None:
        sim = jnp.where(valid2[None, :], sim, -2.0)
    if max_disp is not None:
        d2 = jnp.sum((xy1[:, None, :] - xy2[None, :, :]) ** 2, axis=-1)
        sim = jnp.where(d2 <= max_disp * max_disp, sim, -2.0)
    best_j = jnp.argmax(sim, axis=1).astype(jnp.int32)
    best1 = jnp.max(sim, axis=1)
    # Second-best for the ratio test.
    masked = sim.at[jnp.arange(sim.shape[0]), best_j].set(-2.0)
    second = jnp.max(masked, axis=1)
    best_i_of_j = jnp.argmax(sim, axis=0).astype(jnp.int32)
    mutual = best_i_of_j[best_j] == jnp.arange(sim.shape[0], dtype=jnp.int32)
    ok = mutual & (best1 >= min_score) & (second <= ratio * best1 + (1 - ratio))
    return best_j, ok
