"""Camera pose bootstrap from 2D tracks alone: two-view essential-matrix
initialization + incremental DLT-PnP registration.

Closes the north-star "full pipeline" gap [BASELINE.json: "feature
detection+matching -> GBP bundle adjustment"]: pixels in, poses out, no
oracle.  The reference repo has no frontend at all (SURVEY.md §2 — its BA
starts from BAL files with poses given); this module plays the role the
classical SfM bootstrap plays upstream of the reference's `gbp_ba`.

All of this is host-side f64 numpy by design: it runs ONCE per sequence on
O(10^2..10^3) matches (microseconds of math), is full of data-dependent
branching (cheirality votes, registration order), and feeds the TPU-resident
GBP refinement, which is where the compute is.

Conventions match models/ba: camera state [omega, t] with x_cam = R x_world
+ t; the first registered camera is the world origin and the two-view
baseline sets the (arbitrary) scale to 1.
"""
from __future__ import annotations

import numpy as np

from gbp_tpu.utils.lie import so3_log


def _to_normalized(obs, k):
    return np.stack([(obs[:, 0] - k[2]) / k[0], (obs[:, 1] - k[3]) / k[1]],
                    axis=1)


def _hartley_normalize(x):
    mean = x.mean(axis=0)
    d = x - mean
    scale = np.sqrt(2.0) / max(np.mean(np.linalg.norm(d, axis=1)), 1e-12)
    t = np.array([[scale, 0, -scale * mean[0]],
                  [0, scale, -scale * mean[1]],
                  [0, 0, 1.0]])
    return d * scale, t


def essential_8pt(x1, x2):
    """Normalized 8-point essential matrix from >= 8 correspondences.

    x1, x2: [m, 2] NORMALIZED image coordinates in views 1, 2.  Returns E
    with x2h^T E x1h = 0, singular values projected to (1, 1, 0)."""
    assert x1.shape[0] >= 8, "essential_8pt needs >= 8 correspondences"
    p1, t1 = _hartley_normalize(x1)
    p2, t2 = _hartley_normalize(x2)
    a = np.stack([
        p2[:, 0] * p1[:, 0], p2[:, 0] * p1[:, 1], p2[:, 0],
        p2[:, 1] * p1[:, 0], p2[:, 1] * p1[:, 1], p2[:, 1],
        p1[:, 0], p1[:, 1], np.ones(len(p1)),
    ], axis=1)
    _, _, vt = np.linalg.svd(a)
    e = vt[-1].reshape(3, 3)
    e = t2.T @ e @ t1
    u, _, vt = np.linalg.svd(e)
    return u @ np.diag([1.0, 1.0, 0.0]) @ vt


def _triangulate_two(r, t, x1, x2):
    """Midpoint-free linear triangulation for the pair (I,0), (r,t)."""
    m = x1.shape[0]
    out = np.zeros((m, 3))
    p1 = np.hstack([np.eye(3), np.zeros((3, 1))])
    p2 = np.hstack([r, t[:, None]])
    for i in range(m):
        a = np.stack([
            x1[i, 0] * p1[2] - p1[0],
            x1[i, 1] * p1[2] - p1[1],
            x2[i, 0] * p2[2] - p2[0],
            x2[i, 1] * p2[2] - p2[1],
        ])
        _, _, vt = np.linalg.svd(a)
        x = vt[-1]
        out[i] = x[:3] / x[3]
    return out


def decompose_essential(e, x1, x2):
    """Pick the (R, t) of the 4 essential decompositions by cheirality.

    Returns (r, t, points [m, 3] in view-1 frame, in_front mask)."""
    u, _, vt = np.linalg.svd(e)
    if np.linalg.det(u) < 0:
        u = -u
    if np.linalg.det(vt) < 0:
        vt = -vt
    w = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    best = None
    for r in (u @ w @ vt, u @ w.T @ vt):
        for t in (u[:, 2], -u[:, 2]):
            pts = _triangulate_two(r, t, x1, x2)
            z1 = pts[:, 2]
            z2 = (pts @ r.T + t)[:, 2]
            front = (z1 > 0) & (z2 > 0)
            if best is None or front.sum() > best[3].sum():
                best = (r, t, pts, front)
    return best


def pnp_dlt(xn, pts):
    """DLT camera resection from >= 6 (2D normalized, 3D world) pairs.

    Returns (r, t) with x_cam = r x_world + t, or None if degenerate."""
    m = xn.shape[0]
    if m < 6:
        return None
    # Normalize the 3D points for conditioning.
    c = pts.mean(axis=0)
    s = np.sqrt(3.0) / max(np.mean(np.linalg.norm(pts - c, axis=1)), 1e-12)
    ph = np.hstack([(pts - c) * s, np.ones((m, 1))])
    rows = []
    for i in range(m):
        rows.append(np.concatenate([ph[i], np.zeros(4), -xn[i, 0] * ph[i]]))
        rows.append(np.concatenate([np.zeros(4), ph[i], -xn[i, 1] * ph[i]]))
    _, _, vt = np.linalg.svd(np.asarray(rows))
    p = vt[-1].reshape(3, 4)
    mm = p[:, :3]
    um, sm, vmt = np.linalg.svd(mm)
    if np.prod(sm) < 1e-12:
        return None
    r = um @ vmt
    if np.linalg.det(r) < 0:
        r = -r
        p = -p
    scale = sm.mean()
    t = p[:, 3] / scale
    # Undo 3D normalization: x_cam = r (s (X - c)) + t  =>  t' = t - s r c
    t = t * (1.0 / s)
    t = t - r @ c
    # Cheirality: majority of the points must be in front.
    z = (pts @ r.T + t)[:, 2]
    if (z > 0).sum() < m / 2:
        return None
    return r, t


def initialize_poses(k, cam_ids, lmk_ids, obs, n_cams,
                     min_common=12, pnp_min_pts=8, reproj_gate=8.0):
    """Bootstrap all camera poses + landmark points from tracks alone.

    k: [fx, fy, cx, cy]; (cam_ids, lmk_ids, obs): the track observations
    build_tracks produces.  Strategy (classical incremental SfM, e.g.
    Hartley & Zisserman ch.10-12 / the bootstrap every BA system assumes):

      1. seed: the adjacent frame pair with the most shared tracks ->
         essential matrix (8-point) -> cheirality-checked (R, t), baseline
         scale := 1, world := first camera of the pair;
      2. repeat: triangulate every track with >= 2 registered views, then
         register the unregistered camera seeing the most triangulated
         points via DLT PnP (gated by reprojection error).

    Returns (cams [n_cams, 6], lmks [n_lmks, 3], cam_ok, lmk_ok) — means
    ready for models/ba.build; unresolved entries are zero with mask False.
    """
    import jax.numpy as jnp

    from gbp_tpu.frontend.pipeline import triangulate

    k = np.asarray(k, dtype=np.float64)
    cam_ids = np.asarray(cam_ids)
    lmk_ids = np.asarray(lmk_ids)
    obs = np.asarray(obs, dtype=np.float64)
    n_lmks = int(lmk_ids.max()) + 1 if lmk_ids.size else 0
    xn = _to_normalized(obs, k)

    # Per-camera observation table.
    obs_of = [np.flatnonzero(cam_ids == c) for c in range(n_cams)]
    track_of = [dict(zip(lmk_ids[o], o)) for o in obs_of]

    # 1. Seed pair: adjacent pair sharing the most tracks.
    best_pair, best_common = None, -1
    for c in range(n_cams - 1):
        common = np.intersect1d(lmk_ids[obs_of[c]], lmk_ids[obs_of[c + 1]])
        if common.size > best_common:
            best_pair, best_common = (c, c + 1), common.size
    if best_pair is None or best_common < max(min_common, 8):
        raise ValueError("not enough shared tracks to bootstrap a pose pair")
    c0, c1 = best_pair
    common = np.intersect1d(lmk_ids[obs_of[c0]], lmk_ids[obs_of[c1]])
    i0 = np.asarray([track_of[c0][t] for t in common])
    i1 = np.asarray([track_of[c1][t] for t in common])
    e = essential_8pt(xn[i0], xn[i1])
    r, t, pts, front = decompose_essential(e, xn[i0], xn[i1])
    t = t / max(np.linalg.norm(t), 1e-12)  # gauge: unit baseline

    cams = np.zeros((n_cams, 6))
    cam_ok = np.zeros(n_cams, dtype=bool)
    cams[c0] = 0.0
    cams[c1, :3] = np.asarray(so3_log(jnp.asarray(r)))
    cams[c1, 3:] = t
    cam_ok[[c0, c1]] = True

    lmks = np.zeros((n_lmks, 3))
    lmk_ok = np.zeros(n_lmks, dtype=bool)

    def retriangulate():
        """Triangulate every track with >= 2 registered views; gate by
        reprojection error against all registered views."""
        reg = np.flatnonzero(cam_ok)
        sel = np.isin(cam_ids, reg)
        if not sel.any():
            return
        tids = lmk_ids[sel]
        counts = np.bincount(tids, minlength=n_lmks)
        multi = counts >= 2
        sel &= multi[lmk_ids]
        if not sel.any():
            return
        pts3 = np.asarray(triangulate(cams, k, cam_ids[sel], lmk_ids[sel],
                                      obs[sel], n_lmks=n_lmks))
        # gate: max reprojection error over the registered views
        from gbp_tpu.utils.lie import so3_exp as _exp
        rot = np.asarray(_exp(jnp.asarray(cams[:, :3])))
        ci, li = cam_ids[sel], lmk_ids[sel]
        xc = np.einsum("oij,oj->oi", rot[ci], pts3[li]) + cams[ci, 3:]
        zok = xc[:, 2] > 1e-3
        uv = np.stack([k[0] * xc[:, 0] / np.where(zok, xc[:, 2], 1.0) + k[2],
                       k[1] * xc[:, 1] / np.where(zok, xc[:, 2], 1.0) + k[3]],
                      axis=1)
        err = np.linalg.norm(uv - obs[sel], axis=1)
        bad = np.zeros(n_lmks, dtype=bool)
        np.add.at(bad, li[~zok | (err > reproj_gate)], True)
        good = multi & ~bad
        lmks[good] = pts3[good]
        lmk_ok[:] = good

    retriangulate()

    # 2. Incremental registration.
    for _ in range(n_cams):
        cand, cand_n = None, 0
        for c in np.flatnonzero(~cam_ok):
            n = int(lmk_ok[lmk_ids[obs_of[c]]].sum())
            if n > cand_n:
                cand, cand_n = c, n
        if cand is None or cand_n < pnp_min_pts:
            break
        o = obs_of[cand]
        use = lmk_ok[lmk_ids[o]]
        res = pnp_dlt(xn[o][use], lmks[lmk_ids[o][use]])
        if res is None:
            break
        r, t = res
        cams[cand, :3] = np.asarray(so3_log(jnp.asarray(r)))
        cams[cand, 3:] = t
        cam_ok[cand] = True
        retriangulate()

    return cams, lmks, cam_ok, lmk_ok
