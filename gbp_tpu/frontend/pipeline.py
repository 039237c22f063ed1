"""Frontend pipeline: images -> tracks -> triangulated BA problem.

Completes the north-star SfM path [BASELINE.json: "feature
detection+matching, GBP-based bundle adjustment"]: Harris/ZNCC feature
tracking (gbp_tpu/frontend/features.py), host-side track chaining, linear
triangulation, and construction of the arrays `models.ba.build` consumes.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gbp_tpu.frontend import features
from gbp_tpu.utils.lie import hat3, so3_exp
from gbp_tpu.utils.smalllinalg import bT, bmm, bmv, scaled_sym_inv


def build_tracks(images, max_corners: int = 512, patch_size: int = 9,
                 min_score: float = 0.6, ratio: float = 0.95,
                 min_track_len: int = 2, max_disp: float | None = None):
    """Detect + match across an image sequence; chain matches into tracks.

    images: list/array of [H, W] float frames.  Returns (cam_ids, lmk_ids,
    obs [n, 2]) — one row per observation of a track, BA-builder-ready.
    Matching is frame-to-frame (consecutive pairs); chaining runs on host
    (tiny, data-dependent) while detection/description/matching are jitted.
    """
    n_frames = len(images)
    xys, descs, valids = [], [], []
    for img in images:
        xy, score = features.detect(jnp.asarray(img), max_corners=max_corners)
        desc = features.extract_patches(jnp.asarray(img), xy, size=patch_size)
        xys.append(np.asarray(xy))
        descs.append(desc)
        valids.append(np.asarray(score) > 0)

    # Track chaining: track_of[f][i] = global track id of feature i in frame f.
    track_of = [np.full(max_corners, -1, dtype=np.int64) for _ in range(n_frames)]
    n_tracks = 0
    obs_cam, obs_track, obs_uv = [], [], []
    for f in range(n_frames - 1):
        mj, ok = features.match(
            descs[f], descs[f + 1],
            valid1=jnp.asarray(valids[f]), valid2=jnp.asarray(valids[f + 1]),
            xy1=jnp.asarray(xys[f]), xy2=jnp.asarray(xys[f + 1]),
            min_score=min_score, ratio=ratio, max_disp=max_disp,
        )
        mj, ok = np.asarray(mj), np.asarray(ok)
        for i in np.flatnonzero(ok):
            j = mj[i]
            t = track_of[f][i]
            if t < 0:
                t = n_tracks
                n_tracks += 1
                track_of[f][i] = t
                obs_cam.append(f)
                obs_track.append(t)
                obs_uv.append(xys[f][i])
            track_of[f + 1][j] = t
            obs_cam.append(f + 1)
            obs_track.append(t)
            obs_uv.append(xys[f + 1][j])

    cam_ids = np.asarray(obs_cam, dtype=np.int64)
    lmk_ids = np.asarray(obs_track, dtype=np.int64)
    obs = np.asarray(obs_uv, dtype=np.float64).reshape(-1, 2)

    # Keep tracks seen >= min_track_len times; remap ids densely.
    counts = np.bincount(lmk_ids, minlength=n_tracks)
    keep = counts >= min_track_len
    remap = -np.ones(n_tracks, dtype=np.int64)
    remap[keep] = np.arange(int(keep.sum()))
    sel = keep[lmk_ids]
    return cam_ids[sel], remap[lmk_ids[sel]], obs[sel]


def triangulate(cams, k, cam_ids, lmk_ids, obs, n_lmks=None, eps=1e-8):
    """Linear (DLT-style) triangulation of tracks given camera poses.

    cams: [n_cams, 6] world->camera [omega, t] states; k: [fx, fy, cx, cy].
    Each observation contributes the constraint [x_n]x (R X + t) = 0 with
    x_n the normalized ray; per-landmark 3x3 normal equations accumulate via
    segment_sum and solve in closed form.  Returns [n_lmks, 3].
    """
    cams = jnp.asarray(cams)
    k = jnp.asarray(k, dtype=cams.dtype)
    obs = jnp.asarray(obs, dtype=cams.dtype)
    if n_lmks is None:
        n_lmks = int(np.asarray(lmk_ids).max()) + 1
    r = so3_exp(cams[:, :3])  # [n_cams, 3, 3]
    xn = jnp.stack(
        [(obs[:, 0] - k[2]) / k[0], (obs[:, 1] - k[3]) / k[1],
         jnp.ones_like(obs[:, 0])], axis=-1,
    )
    cross = hat3(xn)  # [m, 3, 3]
    a = bmm(cross, r[cam_ids])  # [m, 3, 3]
    b = -bmv(cross, cams[cam_ids, 3:])  # [m, 3]
    ata = jax.ops.segment_sum(bmm(bT(a), a), lmk_ids, num_segments=n_lmks)
    atb = jax.ops.segment_sum(bmv(bT(a), b), lmk_ids, num_segments=n_lmks)
    ata = ata + eps * jnp.eye(3, dtype=cams.dtype)
    return bmv(scaled_sym_inv(ata, 3), atb)


def filter_tracks(cams, k, cam_ids, lmk_ids, obs, thresh=3.0,
                  min_track_len=2, n_rounds=2):
    """Geometric outlier rejection: triangulate, gate by reprojection error,
    re-prune, repeat.  Removes the wrong-association tail that survives
    appearance matching (standard SfM practice before bundle adjustment).
    """
    cams = np.asarray(cams)
    k = np.asarray(k)
    cam_ids = np.asarray(cam_ids)
    lmk_ids = np.asarray(lmk_ids)
    obs = np.asarray(obs)
    for _ in range(n_rounds):
        n_lmks = int(lmk_ids.max()) + 1 if lmk_ids.size else 0
        if not n_lmks:
            break
        lmks = np.asarray(triangulate(cams, k, cam_ids, lmk_ids, obs,
                                      n_lmks=n_lmks))
        rot = np.asarray(so3_exp(jnp.asarray(cams[:, :3])))
        xc = np.einsum("oij,oj->oi", rot[cam_ids], lmks[lmk_ids]) + cams[cam_ids, 3:]
        z_ok = xc[:, 2] > 1e-3
        uv = np.stack(
            [k[0] * xc[:, 0] / np.where(z_ok, xc[:, 2], 1.0) + k[2],
             k[1] * xc[:, 1] / np.where(z_ok, xc[:, 2], 1.0) + k[3]], axis=1,
        )
        keep = z_ok & (np.linalg.norm(uv - obs, axis=1) < thresh)
        cam_ids, lmk_ids, obs = cam_ids[keep], lmk_ids[keep], obs[keep]
        # Re-prune short tracks + remap densely.
        counts = np.bincount(lmk_ids, minlength=n_lmks)
        keep_t = counts >= min_track_len
        remap = -np.ones(n_lmks, dtype=np.int64)
        remap[keep_t] = np.arange(int(keep_t.sum()))
        sel = keep_t[lmk_ids]
        cam_ids, lmk_ids, obs = cam_ids[sel], remap[lmk_ids[sel]], obs[sel]
    return cam_ids, lmk_ids, obs


def render_scene(cams, lmks, k, shape=(240, 320), blob_sigma=1.2,
                 intensities=None, seed=0):
    """Render synthetic frames: landmarks splatted as distinctive blobs.

    Test/demo harness for the frontend (no real imagery ships with the
    repo).  Each landmark renders as an anisotropic Gaussian with a
    satellite lobe in a per-landmark random direction, so local patches are
    discriminative under ZNCC (identical isotropic blobs are unmatchable).
    cams [n, 6] world->camera, lmks [nl, 3], k = [fx, fy, cx, cy] scaled to
    `shape`.  Returns [n, H, W] float32 frames in [0, 1].
    """
    rng = np.random.default_rng(seed)
    nl = lmks.shape[0]
    if intensities is None:
        intensities = 0.5 + 0.5 * rng.random(nl)
    # Per-landmark appearance: anisotropic scales, orientation, satellite lobe.
    sx = blob_sigma * (0.7 + 0.9 * rng.random(nl))
    sy = blob_sigma * (0.7 + 0.9 * rng.random(nl))
    phi = 2 * np.pi * rng.random(nl)
    sat_ang = 2 * np.pi * rng.random(nl)
    sat_r = 2.0 + 2.0 * rng.random(nl)
    sat_i = 0.3 + 0.5 * rng.random(nl)

    h, w = shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cams = jnp.asarray(cams, jnp.float32)
    lmks = jnp.asarray(lmks, jnp.float32)
    k = jnp.asarray(k, jnp.float32)
    app = jnp.asarray(
        np.stack([intensities, sx, sy, phi, sat_ang, sat_r, sat_i], 1), jnp.float32
    )

    def one(cam):
        rot = so3_exp(cam[:3])
        xc = lmks @ rot.T + cam[3:]
        vis = xc[:, 2] > 0.5
        u = k[0] * xc[:, 0] / xc[:, 2] + k[2]
        v = k[1] * xc[:, 1] / xc[:, 2] + k[3]

        def splat(img, args):
            ui, vi, ok, a = args
            ii, sxi, syi, ph, sa, sr, si = (a[j] for j in range(7))
            c, s = jnp.cos(ph), jnp.sin(ph)
            dx = xx - ui
            dy = yy - vi
            rx = (c * dx + s * dy) / sxi
            ry = (-s * dx + c * dy) / syi
            blob = ii * jnp.exp(-0.5 * (rx * rx + ry * ry))
            d2s = (dx - sr * jnp.cos(sa)) ** 2 + (dy - sr * jnp.sin(sa)) ** 2
            blob = blob + si * ii * jnp.exp(-0.5 * d2s / (0.6 * sxi) ** 2)
            return img + jnp.where(ok, blob, 0.0), None

        img, _ = jax.lax.scan(splat, jnp.zeros((h, w), jnp.float32),
                              (u, v, vis, app))
        return jnp.clip(img, 0.0, 1.0)

    return jax.jit(jax.vmap(one))(cams)
