"""Bundle adjustment on BAL-style problems (BASELINE.json configs[2..3]).

Reference parity: joeaortiz/gbp `gbp/gbp_ba.py` (SURVEY.md C9):
  * one 6-dof variable per camera ([omega, t], world->camera), one 3-dof per
    landmark, one reprojection factor per observation;
  * strong prior anchoring the gauge (first camera; optionally the scale via a
    second anchor), weak priors elsewhere;
  * `weaken_priors` progressively relaxes the artificial strong priors over
    early sweeps so they don't bias the solution (arXiv:2003.03134 §4
    "prior scheduling");
  * average reprojection error metric over all factors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.graph import Graph, GraphBuilder
from gbp_tpu.core.sweep import GBPState, _vmap_factor, gather_linpoint
from gbp_tpu.factors import reprojection
from gbp_tpu.utils.lie import so3_exp, so3_log

CAM = 0  # variable-block handles returned by build()
LMK = 1


def simulate(
    n_cams=12,
    n_lmks=300,
    pix_sigma=1.0,
    radius=10.0,
    fov_frac=0.7,
    cam_noise=(0.03, 0.08),
    lmk_noise=0.3,
    seed=0,
    k=(500.0, 500.0, 320.0, 240.0),
):
    """Synthetic BA scene: cameras on an arc looking at a landmark cloud.

    Returns BAL-style arrays (the same tuple shape the reference's
    read_balfile produces, SURVEY.md C11): ground-truth + noisy-initial camera
    and landmark means, pixel observations with ids, shared intrinsics K.
    """
    rng = np.random.default_rng(seed)
    k_arr = np.asarray(k)

    # Ground-truth cameras: positions on an arc, looking at the origin.
    angles = np.linspace(0, fov_frac * 2 * np.pi, n_cams, endpoint=False)
    centers = np.stack(
        [radius * np.cos(angles), radius * np.sin(angles), 1.0 + 0.2 * rng.standard_normal(n_cams)],
        axis=1,
    )
    cams = np.zeros((n_cams, 6))
    for i, c in enumerate(centers):
        fwd = -c / np.linalg.norm(c)
        up0 = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up0)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        r_wc = np.stack([right, up, fwd], axis=1)  # cam axes in world coords
        r = r_wc.T  # world -> cam
        cams[i, :3] = np.asarray(so3_log(jnp.asarray(r)))
        cams[i, 3:] = -r @ c

    # Landmarks: cloud around the origin.
    lmks = rng.standard_normal((n_lmks, 3)) * np.array([3.0, 3.0, 1.5])

    # Observations: every landmark with positive depth and in-image.
    obs, cam_ids, lmk_ids = [], [], []
    for i in range(n_cams):
        r = np.asarray(so3_exp(jnp.asarray(cams[i, :3])))
        xc = lmks @ r.T + cams[i, 3:]
        uv = np.stack(
            [
                k_arr[0] * xc[:, 0] / xc[:, 2] + k_arr[2],
                k_arr[1] * xc[:, 1] / xc[:, 2] + k_arr[3],
            ],
            axis=1,
        )
        vis = (
            (xc[:, 2] > 0.5)
            & (uv[:, 0] > 0) & (uv[:, 0] < 2 * k_arr[2])
            & (uv[:, 1] > 0) & (uv[:, 1] < 2 * k_arr[3])
        )
        idx = np.flatnonzero(vis)
        obs.append(uv[idx] + pix_sigma * rng.standard_normal((idx.size, 2)))
        cam_ids.append(np.full(idx.size, i))
        lmk_ids.append(idx)
    obs = np.concatenate(obs)
    cam_ids = np.concatenate(cam_ids)
    lmk_ids = np.concatenate(lmk_ids)

    # Keep only landmarks seen >= 2 times (reference BA graphs are connected).
    counts = np.bincount(lmk_ids, minlength=n_lmks)
    keep = counts >= 2
    remap = -np.ones(n_lmks, dtype=np.int64)
    remap[keep] = np.arange(keep.sum())
    sel = keep[lmk_ids]
    obs, cam_ids, lmk_ids = obs[sel], cam_ids[sel], remap[lmk_ids[sel]]
    lmks = lmks[keep]

    cam_init = cams + np.concatenate(
        [cam_noise[0] * rng.standard_normal((n_cams, 3)),
         cam_noise[1] * rng.standard_normal((n_cams, 3))], axis=1
    )
    cam_init[0] = cams[0]  # gauge anchor starts exactly at its prior
    lmk_init = lmks + lmk_noise * rng.standard_normal(lmks.shape)

    return dict(
        cam_truth=cams, lmk_truth=lmks, cam_init=cam_init, lmk_init=lmk_init,
        obs=obs, cam_ids=cam_ids, lmk_ids=lmk_ids, k=k_arr, pix_sigma=pix_sigma,
    )


def simulate_corridor(
    n_cams=32,
    lmks_per_cam=40,
    window=3,
    step=1.0,
    wall_dist=4.0,
    pix_sigma=1.0,
    cam_noise=(0.02, 0.05),
    lmk_noise=0.2,
    seed=0,
    k=(500.0, 500.0, 320.0, 240.0),
):
    """Synthetic corridor/street BA scene with visibility LOCALITY.

    Cameras move along a line looking at a landmark wall; each landmark is
    only visible from cameras within +-`window` positions.  This is the
    city-scale workload of the north star [BASELINE.json]: when partitioned
    into contiguous keyframe blocks, only the landmarks in the window overlap
    at block cuts are boundary variables — the regime the halo-sharded SPMD
    path (parallel/halo.py) is designed for.  The arc scene (`simulate`) has
    every landmark visible from most cameras and therefore no locality.

    Returns the same dict shape as `simulate`.
    """
    rng = np.random.default_rng(seed)
    k_arr = np.asarray(k)

    # Cameras along +x, looking at the wall in +y.
    cams = np.zeros((n_cams, 6))
    fwd = np.array([0.0, 1.0, 0.0])
    up0 = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up0)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    r_wc = np.stack([right, up, fwd], axis=1)
    r = r_wc.T
    # One so3_log for all cameras (shared rotation): a per-camera jnp call
    # here costs one device dispatch each — ~0.1 s over the axon tunnel,
    # i.e. MINUTES of scene build at city scale before hoisting.
    w = np.asarray(so3_log(jnp.asarray(r)))
    for i in range(n_cams):
        c = np.array([i * step, 0.0, 0.0])
        cams[i, :3] = w
        cams[i, 3:] = -r @ c

    # Landmarks on the wall, spread along the corridor.
    n_lmks = n_cams * lmks_per_cam
    lx = rng.uniform(-step, (n_cams - 1 + 1.0) * step, n_lmks)
    lmks = np.stack(
        [lx, wall_dist + 0.5 * rng.standard_normal(n_lmks),
         0.8 * rng.standard_normal(n_lmks)], axis=1)

    obs, cam_ids, lmk_ids = [], [], []
    for i in range(n_cams):
        xi = i * step
        near = np.flatnonzero(np.abs(lmks[:, 0] - xi) <= window * step)
        xc = lmks[near] @ r.T + cams[i, 3:]
        uv = np.stack(
            [k_arr[0] * xc[:, 0] / xc[:, 2] + k_arr[2],
             k_arr[1] * xc[:, 1] / xc[:, 2] + k_arr[3]], axis=1)
        vis = (
            (xc[:, 2] > 0.5)
            & (uv[:, 0] > 0) & (uv[:, 0] < 2 * k_arr[2])
            & (uv[:, 1] > 0) & (uv[:, 1] < 2 * k_arr[3])
        )
        idx = near[vis]
        obs.append(uv[vis] + pix_sigma * rng.standard_normal((idx.size, 2)))
        cam_ids.append(np.full(idx.size, i))
        lmk_ids.append(idx)
    obs = np.concatenate(obs)
    cam_ids = np.concatenate(cam_ids)
    lmk_ids = np.concatenate(lmk_ids)

    counts = np.bincount(lmk_ids, minlength=n_lmks)
    keep = counts >= 2
    remap = -np.ones(n_lmks, dtype=np.int64)
    remap[keep] = np.arange(keep.sum())
    sel = keep[lmk_ids]
    obs, cam_ids, lmk_ids = obs[sel], cam_ids[sel], remap[lmk_ids[sel]]
    lmks = lmks[keep]

    cam_init = cams + np.concatenate(
        [cam_noise[0] * rng.standard_normal((n_cams, 3)),
         cam_noise[1] * rng.standard_normal((n_cams, 3))], axis=1)
    cam_init[0] = cams[0]
    lmk_init = lmks + lmk_noise * rng.standard_normal(lmks.shape)

    return dict(
        cam_truth=cams, lmk_truth=lmks, cam_init=cam_init, lmk_init=lmk_init,
        obs=obs, cam_ids=cam_ids, lmk_ids=lmk_ids, k=k_arr, pix_sigma=pix_sigma,
    )


def simulate_blocks(n_blocks=8, n_cams=40, lmks_per_cam=20, window=3,
                    seed=0, shuffle=False, **kw):
    """`n_blocks` independent corridor blocks merged into one graph: the
    f32-STABLE city-scale locality scene (each block is the proven 40-cam
    corridor config, so the merged problem has bounded effective diameter —
    unlike a single long chain, which is beyond the annealed-GBP recipe at
    300+ cameras in ANY engine path; docs/PERFORMANCE.md "Long single
    chains").  This is the stock large-camera-count benchmark/validation
    scene (tests/tpu/test_onchip.py, gbp_tpu/bench/bigscene.py).

    shuffle=True randomizes the landmark numbering so the windowed table
    path must engage via the locality SORT (real-BAL-file conditions).

    Returns the same dict shape as `simulate`.
    """
    sims = [simulate_corridor(n_cams=n_cams, lmks_per_cam=lmks_per_cam,
                              window=window, seed=seed + i, **kw)
            for i in range(n_blocks)]
    out = {}
    for key in ("cam_truth", "cam_init", "lmk_truth", "lmk_init", "obs"):
        out[key] = np.concatenate([s[key] for s in sims])
    cam_ids, lmk_ids, co, lo = [], [], 0, 0
    for s in sims:
        cam_ids.append(s["cam_ids"] + co)
        lmk_ids.append(s["lmk_ids"] + lo)
        co += s["cam_init"].shape[0]
        lo += s["lmk_init"].shape[0]
    out["cam_ids"] = np.concatenate(cam_ids)
    out["lmk_ids"] = np.concatenate(lmk_ids)
    out["k"] = sims[0]["k"]
    out["pix_sigma"] = sims[0]["pix_sigma"]
    if shuffle:
        rng = np.random.default_rng(seed + 99)
        perm = rng.permutation(lo)
        inv = np.argsort(perm)
        out["lmk_truth"] = out["lmk_truth"][perm]
        out["lmk_init"] = out["lmk_init"][perm]
        out["lmk_ids"] = inv[out["lmk_ids"]]
    return out


def build(
    sim: dict,
    pix_sigma=None,
    huber=None,
    anchor_prec=(1e5, 1e5),
    cam_prior_prec=1.0,
    lmk_prior_prec=1.0,
    normalized=True,
    dtype=jnp.float32,
    layout="ell",
):
    """Build the BA factor graph; returns (graph, init_means).

    layout="ell" (default) stores observations grouped by landmark and
    padded to uniform track length, making landmark belief broadcasts and
    belief updates gather/scatter-free on TPU (core/graph.py); pass "none"
    for insertion-order rows.

    Priors (SURVEY.md C9): camera 0 anchored strongly (6-dof gauge) with
    anchor_prec[0]; camera 1 translation anchored with anchor_prec[1] to pin
    the scale gauge; every other variable gets a medium prior at its initial
    estimate which `weaken_priors` then decays over early sweeps.

    normalized=True (default, required for f32/TPU runs) builds the graph in
    normalized image coordinates: z = (pixel - c) / f, sigma = pix_sigma / f.
    The posterior is identical (same Mahalanobis residuals); only the numeric
    conditioning changes.  Error metrics still report pixels.
    """
    n_cams = sim["cam_init"].shape[0]
    m = sim["obs"].shape[0]
    pix_sigma = sim.get("pix_sigma", 1.0) if pix_sigma is None else pix_sigma
    k_arr = np.asarray(sim["k"], dtype=np.float64)

    b = GraphBuilder(dtype=dtype)
    cam = b.add_variables("cam", sim["cam_init"], prior_prec=cam_prior_prec)
    lmk = b.add_variables("lmk", sim["lmk_init"], prior_prec=lmk_prior_prec)
    b.set_prior(cam, 0, sim["cam_init"][0], anchor_prec[0])
    if n_cams > 1:
        prec1 = np.full(6, cam_prior_prec)
        prec1[3:] = anchor_prec[1]
        b.set_prior(cam, 1, sim["cam_init"][1], prec1)
    conns = [(cam, sim["cam_ids"]), (lmk, sim["lmk_ids"])]
    if normalized:
        z = (sim["obs"] - k_arr[2:]) / k_arr[:2]
        sigma = np.broadcast_to(pix_sigma / k_arr[:2], z.shape)
        b.add_factors("reproj", reprojection.reprojection_normalized(), conns,
                      z, sigma=sigma,
                      huber=huber)
    else:
        k_per_obs = np.tile(k_arr, (m, 1))
        b.add_factors("reproj", reprojection.reprojection(), conns, sim["obs"],
                      sigma=pix_sigma, args=k_per_obs, huber=huber)
    graph, means = b.build(layout=layout)
    return graph, means


def build_bal(
    sim: dict,
    pix_sigma=None,
    huber=None,
    anchor_prec=(1e5, 1e5),
    cam_prior_prec=1.0,
    lmk_prior_prec=1.0,
    normalized=True,
    dtype=jnp.float32,
    layout="ell",
    optimize_intrinsics=False,
    intr_prior_prec=(100.0, 100.0, 100.0),
):
    """Build a BA graph from a BAL-convention problem (io.bal.to_sim dict).

    Same structure as `build` (reference: gbp_ba.create_ba_graph, SURVEY.md C9)
    but with the BAL camera model: per-camera (f, k1, k2) radial distortion and
    the BAL z-negation (factors.reprojection.bal_reprojection*).  Returns
    (graph, init_means, px_scale) where px_scale [m, 2] converts normalized
    residuals back to pixels for error metrics.

    optimize_intrinsics=True promotes the intrinsics into the state — the
    standard 9-parameter BAL camera [omega, t, rf, k1, k2] that Ceres-style
    solvers refine (beyond the reference, whose intrinsics are fixed).  The
    focal is parameterized as rf = f / f0 relative to the file's estimate, so
    the state stays O(1) for f32; `intr_prior_prec` is the diagonal prior
    precision on [rf, k1, k2] (the file's intrinsics are good estimates, so
    they get a real prior rather than the weak positional one; it is still
    weakened by the annealing schedule like every non-anchor prior).
    Requires normalized=True (the pixel-space form would reintroduce the
    O(focal) conditioning the normalized build exists to remove).
    """
    n_cams = sim["cam_init"].shape[0]
    pix_sigma = sim.get("pix_sigma", 1.0) if pix_sigma is None else pix_sigma
    intr = np.asarray(sim["intrinsics"], dtype=np.float64)  # [n_cams, 3]
    cam_ids = sim["cam_ids"]

    b = GraphBuilder(dtype=dtype)
    if optimize_intrinsics:
        if not normalized:
            raise ValueError("optimize_intrinsics requires normalized=True")
        # 9-dof cameras: [omega, t, rf=1, k1, k2].
        cam_state = np.concatenate(
            [sim["cam_init"], np.ones((n_cams, 1)), intr[:, 1:3]], axis=1)
        prior_prec = np.concatenate(
            [np.full((n_cams, 6), cam_prior_prec),
             np.broadcast_to(np.asarray(intr_prior_prec), (n_cams, 3))], axis=1)
        cam = b.add_variables("cam", cam_state, prior_prec=prior_prec)
    else:
        cam = b.add_variables("cam", sim["cam_init"], prior_prec=cam_prior_prec)
    lmk = b.add_variables("lmk", sim["lmk_init"], prior_prec=lmk_prior_prec)

    def cam_anchor(idx, pose_prec):
        if not optimize_intrinsics:
            b.set_prior(cam, idx, sim["cam_init"][idx], pose_prec)
            return
        prec = np.concatenate(
            [np.broadcast_to(pose_prec, (6,)), np.asarray(intr_prior_prec)])
        state = np.concatenate(
            [sim["cam_init"][idx], [1.0], intr[idx, 1:3]])
        b.set_prior(cam, idx, state, prec)

    cam_anchor(0, anchor_prec[0])
    if n_cams > 1:
        prec1 = np.full(6, cam_prior_prec)
        prec1[3:] = anchor_prec[1]
        cam_anchor(1, prec1)
    conns = [(cam, cam_ids), (lmk, sim["lmk_ids"])]
    f_per_obs = intr[cam_ids, 0]  # [m]
    if optimize_intrinsics:
        z = sim["obs"] / f_per_obs[:, None]
        sigma = np.broadcast_to((pix_sigma / f_per_obs)[:, None], z.shape)
        b.add_factors("reproj", reprojection.bal_reprojection_intrinsics(),
                      conns, z, sigma=sigma, huber=huber)
    elif normalized:
        z = sim["obs"] / f_per_obs[:, None]
        sigma = np.broadcast_to((pix_sigma / f_per_obs)[:, None], z.shape)
        b.add_factors("reproj", reprojection.bal_reprojection_normalized(),
                      conns, z, sigma=sigma, args=intr[cam_ids, 1:3],
                      huber=huber)
    else:
        b.add_factors("reproj", reprojection.bal_reprojection(), conns,
                      sim["obs"], sigma=pix_sigma, args=intr[cam_ids],
                      huber=huber)
    graph, means = b.build(layout=layout)
    # px_scale is derived from the BUILT rows (ELL layout permutes them).
    fb = graph.fblocks[0]
    if normalized:
        f_row = intr[np.asarray(fb.adj[0]), 0]
        px_scale = np.broadcast_to(f_row[:, None], (fb.count, 2)).copy()
    else:
        px_scale = np.ones((fb.count, 2))
    return graph, means, jnp.asarray(px_scale, dtype=dtype)


def weaken_priors(graph: Graph, factor=0.1, keep=((0, (0, 1), (0, 6)),)) -> Graph:
    """Scale all variable priors by `factor`, except listed anchors.

    keep: iterable of (vblock_index, variable_indices) or
    (vblock_index, variable_indices, (lo, hi)) to leave untouched; the
    optional (lo, hi) half-open component range pins only those state
    components (the default pins components 0..6 of cameras 0 and 1 — the
    whole state for 6-dof cameras, pose-only for the 9-dof intrinsics
    cameras, whose intrinsics prior must anneal like everyone else's).
    Reference: BAFactorGraph.weaken_priors (SURVEY.md C9).  Returns a new
    Graph (functional update); beliefs pick up the change at the next sweep's
    belief update.
    """
    keep_map = {e[0]: (np.asarray(e[1]), e[2] if len(e) > 2 else None)
                for e in keep}
    new_vblocks = []
    for vi, vb in enumerate(graph.vblocks):
        dof = vb.prior_eta.shape[1]
        scale = jnp.full((vb.count, dof), factor, dtype=vb.prior_eta.dtype)
        if vi in keep_map:
            ids, comps = keep_map[vi]
            lo, hi = (0, dof) if comps is None else comps
            scale = scale.at[ids, lo:min(hi, dof)].set(1.0)
        new_vblocks.append(
            vb.replace(
                prior_eta=vb.prior_eta * scale,
                prior_lam=vb.prior_lam * scale[:, :, None],
            )
        )
    return graph.replace(vblocks=tuple(new_vblocks))


def align_sim3(src: np.ndarray, dst: np.ndarray):
    """Umeyama similarity alignment: returns s, R, t with dst ~ s R src + t.

    Used for gauge-invariant comparisons: BA has a 7-dof null space (rigid +
    scale) only softly pinned by priors, so raw state vectors of two equally
    good solutions differ along it."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    cs = src - mu_s
    cd = dst - mu_d
    cov = cd.T @ cs / len(src)
    u, dvals, vt = np.linalg.svd(cov)
    sgn = np.eye(cov.shape[0])
    if np.linalg.det(u @ vt) < 0:
        sgn[-1, -1] = -1
    rot = u @ sgn @ vt
    var_s = (cs * cs).sum() / len(src)
    scale = float(np.trace(np.diag(dvals) @ sgn) / var_s)
    t = mu_d - scale * rot @ mu_s
    return scale, rot, t


def apply_sim3(scale, rot, t, pts):
    return scale * np.asarray(pts) @ np.asarray(rot).T + np.asarray(t)


def with_means(state: GBPState, means: tuple) -> GBPState:
    """Return a state whose belief means are replaced (for metric evaluation)."""
    new_v = tuple(
        vs.replace(mean=jnp.asarray(mu)) for vs, mu in zip(state.v, means)
    )
    return state.replace(v=new_v)


def reprojection_errors(graph: Graph, state: GBPState, fi: int = 0) -> jnp.ndarray:
    """Per-factor reprojection error ||z - h(mean)||_2 in pixels [m].

    For normalized-coordinate graphs the residual is rescaled by the focal
    lengths recovered from the measurement sigmas (prec = (f/pix_sigma)^2 is
    not invertible without pix_sigma, so we carry the scale explicitly when
    the factor type is normalized)."""
    fb = graph.fblocks[fi]
    x = gather_linpoint(graph, state, fi)
    h = _vmap_factor(fb.ftype.meas, x, fb.args)
    r = jax.vmap(fb.ftype.residual)(fb.z, h)
    return jnp.linalg.norm(r, axis=-1)


def reprojection_errors_px(graph: Graph, state: GBPState, k=None, fi: int = 0,
                           px_scale=None) -> jnp.ndarray:
    """Pixel-space reprojection errors for normalized-coordinate graphs.

    Pass k = [fx, fy, cx, cy] for shared-intrinsics graphs, or px_scale [m, 2]
    (returned by build_bal) for per-camera-focal BAL graphs."""
    fb = graph.fblocks[fi]
    x = gather_linpoint(graph, state, fi)
    h = _vmap_factor(fb.ftype.meas, x, fb.args)
    r = jax.vmap(fb.ftype.residual)(fb.z, h)
    if px_scale is not None:
        r = r * px_scale
    elif fb.ftype.name == "reprojection_normalized" and k is not None:
        r = r * jnp.asarray(k[:2], dtype=r.dtype)
    return jnp.linalg.norm(r, axis=-1)


def avg_reprojection_error(graph: Graph, state: GBPState, fi: int = 0, k=None,
                           px_scale=None) -> jnp.ndarray:
    """The reference's `are()` metric in pixels (SURVEY.md C9).

    Pass k (intrinsics [fx, fy, cx, cy]) or px_scale [m, 2] for
    normalized-coordinate graphs.  ELL padding rows are excluded."""
    if k is not None or px_scale is not None:
        e = reprojection_errors_px(graph, state, k, fi, px_scale)
    else:
        e = reprojection_errors(graph, state, fi)
    valid = graph.fblocks[fi].valid
    if valid is None:
        return jnp.mean(e)
    return jnp.sum(jnp.where(valid, e, 0.0)) / jnp.sum(valid)
