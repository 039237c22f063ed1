"""Incremental BA (gbp_tpu/models/online.py): frames stream in, the graph
grows by value inside fixed-capacity arrays, nothing recompiles, and the
estimate tracks the batch solution."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba, online


def _frames_from_sim(sim):
    """Group observations by camera (arrival order) with landmarks numbered
    by first sighting — the online ids."""
    k = sim["k"]
    uv_n = np.stack([(sim["obs"][:, 0] - k[2]) / k[0],
                     (sim["obs"][:, 1] - k[3]) / k[1]], axis=1)
    remap = {}
    frames = []
    for c in range(sim["cam_init"].shape[0]):
        sel = np.flatnonzero(sim["cam_ids"] == c)
        new_lmks = []
        ids = []
        for t in sim["lmk_ids"][sel]:
            if t not in remap:
                remap[t] = len(remap)
                new_lmks.append(sim["lmk_init"][t])
            ids.append(remap[t])
        frames.append(dict(
            cam=sim["cam_init"][c],
            obs_lmk=np.asarray(ids, dtype=np.int32),
            obs_uv=uv_n[sel],
            new_lmks=np.asarray(new_lmks).reshape(-1, 3),
        ))
    return frames, remap


def _pad(a, n, width=None):
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[: len(a)] = a
    return out


def test_online_streaming_matches_batch():
    sim = ba.simulate(n_cams=8, n_lmks=120, seed=0, fov_frac=0.25)
    frames, remap = _frames_from_sim(sim)
    chunk = 128
    assert all(len(f["obs_lmk"]) <= chunk for f in frames)

    f = sim["k"][0]
    ob = online.create(cam_capacity=10, lmk_capacity=300, obs_capacity=2048,
                       chunk=chunk, pix_sigma_n=sim["pix_sigma"] / f)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)

    for i, fr in enumerate(frames):
        # anchors mirror models/ba.build: cam 0 fully, cam 1 translation
        if i == 0:
            prec = np.full(6, 1e5)
        elif i == 1:
            prec = np.array([1.0] * 3 + [1e5] * 3)
        else:
            prec = np.ones(6)
        n_o = len(fr["obs_lmk"])
        n_l = len(fr["new_lmks"])
        ob = online.add_frame(
            ob, jnp.asarray(fr["cam"]), jnp.asarray(prec),
            jnp.zeros(chunk, jnp.int32),  # all obs belong to the new camera
            jnp.asarray(_pad(fr["obs_lmk"], chunk)),
            jnp.asarray(_pad(fr["obs_uv"], chunk)),
            jnp.int32(n_o),
            jnp.asarray(_pad(fr["new_lmks"], chunk)),
            jnp.int32(n_l),
        )
        ob = online.run(ob, cfg, 10)
        # age-annealed landmark priors: firm on arrival, relaxed per frame
        ob = online.weaken_landmark_priors(ob, 0.6)
    ob = online.run(ob, cfg, 40)

    # one compile for add_frame across the whole stream; run compiles once
    # per distinct static n_iters (10 and 40 here)
    assert online._add_frame_jit._cache_size() == 1
    assert online.run._cache_size() == 2
    assert int(ob.n_cams) == 8 and int(ob.n_obs) == sim["obs"].shape[0]

    # pixel ARE over the active rows
    m = ob.graph.fblocks[0].count
    px_scale = np.full((m, 2), f)
    are = float(ba.avg_reprojection_error(ob.graph, ob.state,
                                          px_scale=px_scale))
    assert np.isfinite(are) and are < 2.0, are

    # quality parity with the batch solution (the two optimization paths may
    # settle in different but equally good local optima of the nonconvex
    # posterior, so compare the metric, not the raw states)
    graph, means = ba.build(sim)
    batch = jax.jit(run, static_argnums=3)(
        graph, init_state(graph, means), cfg, 120)
    are_batch = float(ba.avg_reprojection_error(graph, batch, k=sim["k"]))
    assert are < 1.15 * are_batch + 0.05, (are, are_batch)

    # and the camera centers are metrically close to the batch answer
    from gbp_tpu.utils.lie import so3_exp

    def centers(c):
        r = np.asarray(so3_exp(jnp.asarray(c[:, :3])))
        return -np.einsum("nij,nj->ni", r.transpose(0, 2, 1), c[:, 3:])

    d = np.linalg.norm(centers(np.asarray(ob.state.v[0].mean[:8]))
                       - centers(np.asarray(batch.v[0].mean)), axis=1)
    # The posterior has a soft twist mode about the anchored start (only
    # ~1.3 gauge anchors), so equally-good optima can differ by a few % of
    # the scene scale along the sequence; ARE parity above is the real
    # check, this bounds gross divergence.
    assert d.max() < 0.5, d  # scene scale ~10


def test_online_snapshot_roundtrip():
    sim = ba.simulate(n_cams=5, n_lmks=60, seed=2, fov_frac=0.25)
    frames, _ = _frames_from_sim(sim)
    chunk = 128
    f = sim["k"][0]
    ob = online.create(cam_capacity=6, lmk_capacity=200, obs_capacity=1024,
                       chunk=chunk, pix_sigma_n=sim["pix_sigma"] / f)
    cfg = GBPConfig()
    for i, fr in enumerate(frames):
        prec = np.full(6, 1e5) if i == 0 else np.ones(6)
        ob = online.add_frame(
            ob, jnp.asarray(fr["cam"]), jnp.asarray(prec),
            jnp.zeros(chunk, jnp.int32),
            jnp.asarray(_pad(fr["obs_lmk"], chunk)),
            jnp.asarray(_pad(fr["obs_uv"], chunk)),
            jnp.int32(len(fr["obs_lmk"])),
            jnp.asarray(_pad(fr["new_lmks"], chunk)),
            jnp.int32(len(fr["new_lmks"])),
        )
    ob = online.run(ob, cfg, 20)
    snap = online.snapshot(ob)
    assert snap["cam_means"].shape == (5, 6)
    assert snap["z"].shape[0] == sim["obs"].shape[0]
    assert np.isfinite(snap["lmk_means"]).all()


def test_online_capacity_guard():
    import pytest

    ob = online.create(cam_capacity=1, lmk_capacity=140, obs_capacity=300,
                       chunk=128)
    ob = online.add_frame(
        ob, jnp.zeros(6), jnp.ones(6), jnp.zeros(128, jnp.int32),
        jnp.zeros(128, jnp.int32), jnp.zeros((128, 2)), jnp.int32(4),
        jnp.zeros((128, 3)), jnp.int32(4))
    with pytest.raises(ValueError, match="camera capacity"):
        online.add_frame(
            ob, jnp.zeros(6), jnp.ones(6), jnp.zeros(128, jnp.int32),
            jnp.zeros(128, jnp.int32), jnp.zeros((128, 2)), jnp.int32(4),
            jnp.zeros((128, 3)), jnp.int32(4))


def test_fixed_lag_eviction_streams_past_capacity():
    """VERDICT r2 item 2: the online model must serve indefinitely.  Stream
    3x cam_capacity corridor frames through a fixed-lag window (evict_frames
    marginalizes the oldest cameras into landmark priors), with one compile
    per jitted step and bounded window-ARE vs a batch solve of the final
    window."""
    n_frames = 24
    sim = ba.simulate_corridor(n_cams=n_frames, lmks_per_cam=12, window=2,
                               seed=1)
    k = sim["k"]
    f = k[0]
    uv_n = np.stack([(sim["obs"][:, 0] - k[2]) / k[0],
                     (sim["obs"][:, 1] - k[3]) / k[1]], axis=1)
    chunk = 128
    cam_capacity, n_evict = 8, 4
    # The corridor recipe: firm annealed arrival priors + lambda damping
    # (chain-structured windows oscillate under undamped precision updates;
    # see docs/PERFORMANCE.md "Chain-structured scenes").
    ob = online.create(cam_capacity=cam_capacity, lmk_capacity=256,
                       obs_capacity=1024, chunk=chunk,
                       pix_sigma_n=sim["pix_sigma"] / f,
                       lmk_prior_prec=1000.0)
    cfg = GBPConfig(eta_damping=0.4, lam_damping=0.4, num_undamped_iters=6,
                    min_linear_iters=8)

    # Host-side id tracking: global landmark id -> live online id; entries
    # whose online id falls below the eviction cut are dropped, and a
    # re-observation after marginalization re-adds as a NEW landmark (the
    # standard fixed-lag frontend behaviour).
    online_id = {}
    ares = []
    # one-compile check via DELTAS (other tests in this file already
    # populated the jit caches with different shapes)
    c_add = online._add_frame_jit._cache_size()
    c_evict = online.evict_frames._cache_size()
    c_run = online.run._cache_size()
    for c in range(n_frames):
        if int(ob.n_cams) + 1 > cam_capacity:
            before = int(ob.n_lmks)
            ob = online.evict_frames(ob, n_evict)
            lmin = before - int(ob.n_lmks)
            online_id = {g: i - lmin for g, i in online_id.items()
                         if i >= lmin}
        sel = np.flatnonzero(sim["cam_ids"] == c)
        ids, new_lmks = [], []
        n_before = int(ob.n_lmks)
        for t in sim["lmk_ids"][sel]:
            if t not in online_id:
                online_id[t] = n_before + len(new_lmks)
                new_lmks.append(sim["lmk_init"][t])
            ids.append(online_id[t])
        prec = np.full(6, 1e5) if c == 0 else np.full(6, 1000.0)
        ob = online.add_frame(
            ob, jnp.asarray(sim["cam_init"][c]), jnp.asarray(prec),
            jnp.zeros(chunk, jnp.int32),
            jnp.asarray(_pad(np.asarray(ids, np.int32), chunk)),
            jnp.asarray(_pad(uv_n[sel], chunk)),
            jnp.int32(len(ids)),
            jnp.asarray(_pad(np.asarray(new_lmks).reshape(-1, 3), chunk)),
            jnp.int32(len(new_lmks)))
        ob = online.run(ob, cfg, 10)
        ob = online.weaken_landmark_priors(ob, 0.6, floor=1.0)
        ob = online.weaken_camera_priors(ob, 0.7, floor=30.0)
        m = ob.graph.fblocks[0].count
        ares.append(float(ba.avg_reprojection_error(
            ob.graph, ob.state, px_scale=np.full((m, 2), f))))

    assert int(ob.n_cams) == cam_capacity  # streamed 3x capacity, window full
    assert online._add_frame_jit._cache_size() == c_add + 1
    assert online.evict_frames._cache_size() == c_evict + 1
    assert online.run._cache_size() == c_run + 1
    # bounded window error across the whole stream (px)
    assert np.isfinite(ares).all() and max(ares[2:]) < 3.0, ares

    # batch solve of the FINAL window's subproblem for comparison
    lo = n_frames - cam_capacity
    wsel = sim["cam_ids"] >= lo
    lmk_keep = np.unique(sim["lmk_ids"][wsel])
    counts = np.bincount(sim["lmk_ids"][wsel], minlength=sim["lmk_init"].shape[0])
    lmk_keep = lmk_keep[counts[lmk_keep] >= 2]
    remap = -np.ones(sim["lmk_init"].shape[0], np.int64)
    remap[lmk_keep] = np.arange(lmk_keep.size)
    rows = wsel & (remap[sim["lmk_ids"]] >= 0)
    wsim = dict(
        cam_init=sim["cam_init"][lo:], lmk_init=sim["lmk_init"][lmk_keep],
        obs=sim["obs"][rows], cam_ids=sim["cam_ids"][rows] - lo,
        lmk_ids=remap[sim["lmk_ids"][rows]], k=k,
        pix_sigma=sim["pix_sigma"])
    graph, means = ba.build(wsim, cam_prior_prec=1000.0,
                            lmk_prior_prec=1000.0)
    batch = init_state(graph, means)
    runj = jax.jit(run, static_argnums=3)
    for _ in range(3):  # the corridor prior-annealing schedule
        batch = runj(graph, batch, cfg, 20)
        graph = ba.weaken_priors(graph, 0.1)
    batch = runj(graph, batch, cfg, 20)
    are_batch = float(ba.avg_reprojection_error(graph, batch, k=k))
    assert ares[-1] < 1.5 * are_batch + 0.3, (ares[-1], are_batch)


def test_serving_recipe_long_stream_stationary():
    """The serving bench's production recipe (bench/serving.py: fused
    whole-frame step, OnlineIds bookkeeping, cheirality fallback, stiff
    camera anneal floor, num_undamped_iters=0, Huber default) stays
    STATIONARY over a stream far past the short-stream tests above — the
    round-5 failure modes (per-frame relin re-opening the undamped window,
    old-end gauge drift, z=0-crossing arrival inits) each diverged this
    setting within ~60-120 frames before their fixes."""
    from gbp_tpu.bench.serving import _make_step, _stream

    sim = ba.simulate_corridor(n_cams=60, lmks_per_cam=20, window=3, seed=1)
    frames = online.frames_from_sim(sim)
    max_obs = max(len(f["lmk_global"]) for f in frames)
    chunk = int(np.ceil(max_obs / 64) * 64)
    f_px = sim["k"][0]
    ob = online.create(cam_capacity=12, lmk_capacity=1024,
                       obs_capacity=4096, chunk=chunk,
                       pix_sigma_n=sim["pix_sigma"] / f_px,
                       lmk_prior_prec=1000.0)
    cfg = GBPConfig(eta_damping=0.4, lam_damping=0.4, num_undamped_iters=0,
                    min_linear_iters=8)
    steps = _make_step(online, jax)
    ares = []

    def on_frame(i, ob):
        m = ob.graph.fblocks[0].count
        ares.append(float(ba.avg_reprojection_error(
            ob.graph, ob.state, px_scale=np.full((m, 2), f_px))))

    _stream(ob, frames, sim["lmk_init"], chunk, cfg, 10, 12, 4, online,
            jnp, steps, on_frame=on_frame)
    a = np.asarray(ares)
    assert np.isfinite(a).all(), a
    # Stationary: bounded median AND a non-degrading tail (transient
    # arrival spikes are allowed; the tail must come back down).
    assert np.median(a) < 2.5, np.median(a)
    assert np.median(a[-10:]) < 1.25 * np.median(a) + 0.5, (
        np.median(a[-10:]), np.median(a))
