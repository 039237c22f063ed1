"""Frontend: Harris detection, ZNCC matching, triangulation, and the full
images -> tracks -> triangulate -> GBP-BA pipeline on rendered frames."""
import numpy as np
import jax.numpy as jnp

from gbp_tpu.core.graph import GraphBuilder
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.factors import reprojection
from gbp_tpu.frontend import features, pipeline
from gbp_tpu.models import ba


def _checkerboard_corners(h=120, w=160, step=20):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (((yy // step) + (xx // step)) % 2).astype(np.float32)


def test_harris_finds_checkerboard_corners():
    img = _checkerboard_corners()
    xy, score = features.detect(jnp.asarray(img), max_corners=64, border=4)
    xy = np.asarray(xy)[np.asarray(score) > 0]
    assert xy.shape[0] >= 20
    # Detected corners land near lattice crossings (multiples of 20).
    offs = np.minimum(xy % 20, 20 - (xy % 20))
    assert float(np.median(offs)) <= 2.0


def test_match_recovers_translation():
    rng = np.random.default_rng(0)
    base = rng.random((140, 200)).astype(np.float32)
    # Smooth the noise so patches are distinctive but matchable.
    k = np.ones((5, 5)) / 25.0
    from scipy.signal import convolve2d

    img1 = convolve2d(base, k, mode="same").astype(np.float32)
    shift = 6
    img2 = np.roll(img1, shift, axis=1)
    xy1, s1 = features.detect(jnp.asarray(img1), max_corners=128)
    xy2, s2 = features.detect(jnp.asarray(img2), max_corners=128)
    d1 = features.extract_patches(jnp.asarray(img1), xy1)
    d2 = features.extract_patches(jnp.asarray(img2), xy2)
    mj, ok = features.match(d1, d2, valid1=s1 > 0, valid2=s2 > 0)
    mj, ok = np.asarray(mj), np.asarray(ok)
    assert ok.sum() >= 10
    dx = np.asarray(xy2)[mj[ok], 0] - np.asarray(xy1)[ok, 0]
    assert abs(np.median(dx) - shift) < 1.0


def test_triangulation_exact_on_noiseless_obs():
    sim = ba.simulate(n_cams=6, n_lmks=60, pix_sigma=0.0, seed=0)
    got = pipeline.triangulate(
        sim["cam_truth"], sim["k"], sim["cam_ids"], sim["lmk_ids"], sim["obs"],
        n_lmks=sim["lmk_truth"].shape[0],
    )
    np.testing.assert_allclose(np.asarray(got), sim["lmk_truth"], atol=1e-2)


def test_full_sfm_pipeline_from_pixels():
    """Render frames from a synthetic scene, track, triangulate, run GBP BA."""
    rng = np.random.default_rng(3)
    shape = (240, 320)
    k = np.array([260.0, 260.0, shape[1] / 2, shape[0] / 2])
    sim = ba.simulate(n_cams=6, n_lmks=120, seed=3, fov_frac=0.25,
                      cam_noise=(0.01, 0.03), k=tuple(k))
    frames = pipeline.render_scene(sim["cam_truth"], sim["lmk_truth"], k,
                                   shape=shape, seed=3)
    cam_ids, lmk_ids, obs = pipeline.build_tracks(
        list(np.asarray(frames)), max_corners=256, min_score=0.9, ratio=0.85,
        min_track_len=3, max_disp=25.0,
    )
    cam_init = sim["cam_truth"] + np.concatenate(
        [0.005 * rng.standard_normal((6, 3)), 0.02 * rng.standard_normal((6, 3))],
        axis=1,
    )
    cam_init[0] = sim["cam_truth"][0]
    cam_ids, lmk_ids, obs = pipeline.filter_tracks(
        cam_init, k, cam_ids, lmk_ids, obs, thresh=4.0, min_track_len=3,
    )
    n_lmks = int(lmk_ids.max()) + 1
    assert obs.shape[0] >= 50, obs.shape
    assert n_lmks >= 15

    lmk_init = np.asarray(
        pipeline.triangulate(cam_init, k, cam_ids, lmk_ids, obs, n_lmks=n_lmks)
    )

    tracked = dict(
        cam_init=cam_init, lmk_init=lmk_init, obs=obs,
        cam_ids=cam_ids, lmk_ids=lmk_ids, k=k, pix_sigma=1.0,
    )
    graph, means = ba.build(tracked, huber=2.0, dtype=jnp.float64)
    state = init_state(graph, means)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    state = run(graph, state, cfg, 50)
    are = float(ba.avg_reprojection_error(graph, state, k=k))
    # Sub-pixel reprojection error from pixels alone.
    assert are < 1.0, are


def _centers(cams):
    from gbp_tpu.utils.lie import so3_exp

    r = np.asarray(so3_exp(jnp.asarray(cams[:, :3])))
    return -np.einsum("nij,nj->ni", r.transpose(0, 2, 1), cams[:, 3:])


def test_essential_two_view_recovers_relative_pose():
    from gbp_tpu.frontend import init_pose
    from gbp_tpu.utils.lie import so3_exp

    sim = ba.simulate(n_cams=2, n_lmks=60, pix_sigma=0.0, seed=4, fov_frac=0.1)
    # correspondences: landmarks seen by both cameras
    common = np.intersect1d(sim["lmk_ids"][sim["cam_ids"] == 0],
                            sim["lmk_ids"][sim["cam_ids"] == 1])
    x = {}
    for c in (0, 1):
        sel = sim["cam_ids"] == c
        ids = dict(zip(sim["lmk_ids"][sel], np.flatnonzero(sel)))
        o = sim["obs"][[ids[t] for t in common]]
        k = sim["k"]
        x[c] = np.stack([(o[:, 0] - k[2]) / k[0], (o[:, 1] - k[3]) / k[1]], 1)
    e = init_pose.essential_8pt(x[0], x[1])
    r, t, pts, front = init_pose.decompose_essential(e, x[0], x[1])
    assert front.mean() > 0.95
    # true relative pose (cam0 -> cam1)
    r0 = np.asarray(so3_exp(jnp.asarray(sim["cam_truth"][0, :3])))
    r1 = np.asarray(so3_exp(jnp.asarray(sim["cam_truth"][1, :3])))
    r_rel = r1 @ r0.T
    t_rel = sim["cam_truth"][1, 3:] - r_rel @ sim["cam_truth"][0, 3:]
    np.testing.assert_allclose(r, r_rel, atol=1e-5)
    cos = np.dot(t / np.linalg.norm(t), t_rel / np.linalg.norm(t_rel))
    assert cos > 1 - 1e-8, cos  # direction only; scale is unobservable


def test_pnp_dlt_recovers_pose():
    from gbp_tpu.frontend import init_pose
    from gbp_tpu.utils.lie import so3_exp

    rng = np.random.default_rng(5)
    pts = rng.standard_normal((40, 3)) * [2.0, 2.0, 1.0] + [0, 0, 6.0]
    w = np.array([0.1, -0.2, 0.15])
    r = np.asarray(so3_exp(jnp.asarray(w)))
    t = np.array([0.3, -0.1, 0.5])
    xc = pts @ r.T + t
    xn = xc[:, :2] / xc[:, 2:]
    got = init_pose.pnp_dlt(xn, pts)
    assert got is not None
    np.testing.assert_allclose(got[0], r, atol=1e-8)
    np.testing.assert_allclose(got[1], t, atol=1e-8)


def test_initialize_poses_from_tracks_only():
    """Bootstrap every camera + landmark from 2D tracks (no oracle poses),
    then refine with GBP BA: sub-pixel ARE and sub-1% aligned pose error."""
    from gbp_tpu.frontend import init_pose

    sim = ba.simulate(n_cams=6, n_lmks=80, pix_sigma=0.3, seed=1, fov_frac=0.25)
    cams, lmks, cam_ok, lmk_ok = init_pose.initialize_poses(
        sim["k"], sim["cam_ids"], sim["lmk_ids"], sim["obs"], 6)
    assert cam_ok.all() and lmk_ok.mean() > 0.9

    # keep observations of resolved landmarks; remap densely
    sel = lmk_ok[sim["lmk_ids"]]
    remap = -np.ones(lmk_ok.size, dtype=np.int64)
    remap[lmk_ok] = np.arange(int(lmk_ok.sum()))
    boot = dict(cam_init=cams, lmk_init=lmks[lmk_ok],
                obs=sim["obs"][sel], cam_ids=sim["cam_ids"][sel],
                lmk_ids=remap[sim["lmk_ids"][sel]], k=sim["k"], pix_sigma=1.0)
    graph, means = ba.build(boot, dtype=jnp.float64)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    state = run(graph, init_state(graph, means), cfg, 60)
    are = float(ba.avg_reprojection_error(graph, state, k=sim["k"]))
    assert are < 1.0, are

    got = np.asarray(state.v[0].mean)
    s, r, t = ba.align_sim3(_centers(got), _centers(sim["cam_truth"]))
    err = np.linalg.norm(
        (s * _centers(got) @ r.T + t) - _centers(sim["cam_truth"]), axis=1)
    assert err.max() < 0.1, err  # scene scale ~10


def test_full_sfm_from_pixels_without_oracle_poses():
    """The complete north-star path: rendered pixels -> tracks -> pose
    bootstrap (essential + PnP) -> GBP BA.  No ground-truth pose is used
    anywhere downstream of rendering."""
    from gbp_tpu.frontend import init_pose

    shape = (240, 320)
    k = np.array([260.0, 260.0, shape[1] / 2, shape[0] / 2])
    sim = ba.simulate(n_cams=6, n_lmks=120, seed=3, fov_frac=0.25, k=tuple(k))
    frames = pipeline.render_scene(sim["cam_truth"], sim["lmk_truth"], k,
                                   shape=shape, seed=3)
    cam_ids, lmk_ids, obs = pipeline.build_tracks(
        list(np.asarray(frames)), max_corners=256, min_score=0.9, ratio=0.85,
        min_track_len=3, max_disp=25.0,
    )
    cams, lmks, cam_ok, lmk_ok = init_pose.initialize_poses(
        k, cam_ids, lmk_ids, obs, 6)
    assert cam_ok.all(), cam_ok
    sel = lmk_ok[lmk_ids]
    remap = -np.ones(lmk_ok.size, dtype=np.int64)
    remap[lmk_ok] = np.arange(int(lmk_ok.sum()))
    boot = dict(cam_init=cams, lmk_init=lmks[lmk_ok], obs=obs[sel],
                cam_ids=cam_ids[sel], lmk_ids=remap[lmk_ids[sel]],
                k=k, pix_sigma=1.0)
    graph, means = ba.build(boot, huber=2.0, dtype=jnp.float64)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    state = run(graph, init_state(graph, means), cfg, 60)
    are = float(ba.avg_reprojection_error(graph, state, k=k))
    assert are < 1.5, are


def test_initialize_poses_robust_to_gross_outliers():
    """VERDICT r2 item 7: 25% injected gross matches (uniform random pixels,
    the worst ZNCC failure mode) must not sink the bootstrap — the RANSAC
    loops around essential_8pt / pnp_dlt reject them and the downstream
    Huber-robust BA still reaches the clean-accuracy bounds."""
    from gbp_tpu.frontend import init_pose

    rng = np.random.default_rng(7)
    sim = ba.simulate(n_cams=6, n_lmks=80, pix_sigma=0.3, seed=1,
                      fov_frac=0.25)
    obs = sim["obs"].copy()
    m = obs.shape[0]
    bad = rng.random(m) < 0.25
    k = sim["k"]
    obs[bad] = rng.uniform([0.0, 0.0], [2 * k[2], 2 * k[3]],
                           size=(int(bad.sum()), 2))

    cams, lmks, cam_ok, lmk_ok = init_pose.initialize_poses(
        k, sim["cam_ids"], sim["lmk_ids"], obs, 6)
    assert cam_ok.all(), cam_ok
    assert lmk_ok.mean() > 0.5, lmk_ok.mean()  # corrupted tracks get gated

    sel = lmk_ok[sim["lmk_ids"]]
    remap = -np.ones(lmk_ok.size, dtype=np.int64)
    remap[lmk_ok] = np.arange(int(lmk_ok.sum()))
    boot = dict(cam_init=cams, lmk_init=lmks[lmk_ok],
                obs=obs[sel], cam_ids=sim["cam_ids"][sel],
                lmk_ids=remap[sim["lmk_ids"][sel]], k=k, pix_sigma=1.0)
    # Huber-robust BA: the surviving gross observations are down-weighted.
    graph, means = ba.build(boot, dtype=jnp.float64, huber=2.0)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    state = run(graph, init_state(graph, means), cfg, 80)

    got = np.asarray(state.v[0].mean)
    s, r, t = ba.align_sim3(_centers(got), _centers(sim["cam_truth"]))
    err = np.linalg.norm(
        (s * _centers(got) @ r.T + t) - _centers(sim["cam_truth"]), axis=1)
    assert err.max() < 0.1, err  # scene scale ~10; same bound as the clean test


def test_essential_ransac_rejects_outliers():
    """Unit-level: 30% gross correspondences; RANSAC must recover the clean
    relative pose where plain 8-point is dragged off."""
    from gbp_tpu.frontend import init_pose
    from gbp_tpu.utils.lie import so3_exp

    rng = np.random.default_rng(3)
    n = 120
    pts = rng.standard_normal((n, 3)) * [2.0, 2.0, 0.8] + [0, 0, 6.0]
    r_rel = np.asarray(so3_exp(jnp.asarray([0.05, -0.3, 0.02])))
    t_rel = np.array([1.0, 0.1, -0.05])
    x1 = pts[:, :2] / pts[:, 2:3]
    p2 = pts @ r_rel.T + t_rel
    x2 = p2[:, :2] / p2[:, 2:3]
    bad = rng.random(n) < 0.3
    x2[bad] += rng.uniform(0.2, 0.8, size=(int(bad.sum()), 2))

    e, inl = init_pose.essential_ransac(x1, x2, thresh=5e-3, seed=0)
    assert inl.sum() >= 0.9 * (~bad).sum()
    assert (inl & bad).sum() <= 2
    r, t, _, front = init_pose.decompose_essential(e, x1[inl], x2[inl])
    np.testing.assert_allclose(r, r_rel, atol=1e-3)
    cos = np.dot(t, t_rel) / np.linalg.norm(t) / np.linalg.norm(t_rel)
    assert cos > 0.999, cos
