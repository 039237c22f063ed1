"""On-chip serving benchmark: frames/s through the fixed-lag online path.

The north-star metric names "frames/s (and GBP sweeps/s) scaling
efficiency" [BASELINE.json]; sweeps/s has been measured since round 1 but
frames/s never had an artifact (VERDICT r4 missing #3).  This harness
streams a corridor sequence through `models/online.py` — the serving loop
the reference's papers describe (arXiv:1910.14139 §5: keyframes arrive
continuously) but the batch-only reference never implements:

  per frame: add_frame (one camera + its observations + new landmarks)
             -> `--sweeps_per_frame` GBP sweeps
             -> per-frame prior annealing (weaken_landmark/camera_priors)
             -> fixed-lag eviction of the oldest cameras when the window
                fills (evict_frames: marginalize + compact, static shapes)

Everything is jitted once; the steady-state loop never recompiles
(asserted).  Two passes over the same stream:

  * timed pass — per-frame wall-clock WITH a device sync per frame (real
    serving latency, including host dispatch);
  * quality pass — identical stream, per-frame pixel ARE over the active
    window (not timed; the analogue of bench.py's uncounted MAP target).

Run ON CHIP (single-client tunnel):

    python -m gbp_tpu.bench.serving [--frames 120] [--lag 16]
        [--sweeps_per_frame 10]

Writes gbp_tpu/bench/artifacts/serving_tpu_r5.json.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np


def _pad(a, n):
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[: len(a)] = a
    return out


def _make_step(online, jax):
    """The WHOLE frame as one jitted program: [evict] + add_frame + sweeps
    + prior annealing.  Over the single-client axon tunnel each dispatched
    program costs a host<->device round trip, so serving latency at these
    window sizes is dispatch-bound: fusing the original 4-5 dispatches per
    frame into one measured 15.0 -> 28.7 frames/s (run+anneal fused), then
    -> one-dispatch-per-frame (this form).  Two cache entries (evict on /
    off).  The eviction's landmark compaction cut is PREDICTED host-side
    (the frontend fed every observation, so it knows each camera's min
    landmark id — see _stream), which removes the mid-frame n_lmks device
    read that previously forced a second round trip on eviction frames;
    the quality pass asserts the prediction against the device every
    frame.

    Camera-anneal floor = the arrival precision, i.e. NO camera annealing:
    the 120-frame recipe sweep measured p90 ARE 2.5 px at floor 1000 vs
    4.7 (floor 100) and 27.5 (floor 30, the short-stream recipe) — a
    streamed chain needs stiff pose anchors or the window's old end
    random-walks away from the fresh arrivals' absolute anchoring and the
    growing internal tension bursts."""

    # NOTE: donate_argnums=0 (the previous frame's state buffers are dead
    # after each call) was tried and FAILS at runtime on the axon tunnel
    # backend (InvalidArgument at the first sync) — donation is not
    # supported there; on a directly-attached chip it should be safe to
    # re-enable.
    @functools.partial(jax.jit, static_argnums=(10, 11, 12))
    def step(ob, cam, prec, z0, oid, uv, n_o, nl, n_l, cfg, n_sweeps,
             do_evict, n_evict):
        if do_evict:
            ob = online.evict_frames(ob, n_evict)
        ob = online.add_frame(ob, cam, prec, z0, oid, uv, n_o, nl, n_l,
                              check=False)
        ob = online.run(ob, cfg, n_sweeps)
        ob = online.weaken_landmark_priors(ob, 0.6, floor=1.0)
        return online.weaken_camera_priors(ob, 0.7, floor=1000.0)

    import jax.numpy as jnp

    from gbp_tpu.utils.lie import so3_exp, so3_log

    # Odometry-arrival variant: the arrival pose (previous camera's
    # ESTIMATE composed with the measured relative motion) and the
    # camera-frame landmark placements are computed IN-GRAPH, so the frame
    # stays one dispatch — a host-side composition would read the previous
    # estimate back every frame, which measured 30.8 -> 17.6 frames/s over
    # the tunnel (one extra round trip per frame).
    @functools.partial(jax.jit, static_argnums=(11, 12, 13))
    def step_odo(ob, rel_r, rel_t, prec, z0, oid, uv, n_o, lmk_cam_new,
                 n_l, cfg, n_sweeps, do_evict, n_evict):
        prev = ob.state.v[0].mean[ob.n_cams - 1]
        r = rel_r @ so3_exp(prev[:3])
        t = rel_r @ prev[3:] + rel_t
        cam = jnp.concatenate([so3_log(r), t])
        nl = (lmk_cam_new - t) @ r
        if do_evict:
            ob = online.evict_frames(ob, n_evict)
        ob = online.add_frame(ob, cam, prec, z0, oid, uv, n_o, nl, n_l,
                              check=False)
        ob = online.run(ob, cfg, n_sweeps)
        ob = online.weaken_landmark_priors(ob, 0.6, floor=1.0)
        return online.weaken_camera_priors(ob, 0.7, floor=1000.0)

    return step, step_odo


def _stream(ob, frames, lmk_init, chunk, cfg, sweeps_per_frame, lag, n_evict,
            online, jnp, steps, on_frame=None):
    """Run the serving loop; calls on_frame(i, ob) AFTER each frame's sync
    (quality pass) or records per-frame latency when on_frame is None.

    Frontend bookkeeping is host-side and counted in the frame latency:
    the global→online id map (online.OnlineIds) tracks `evict_frames`'s
    landmark compaction exactly as a real fixed-lag frontend must
    (tests/test_online.py:159 is the converged reference loop — arrival
    prior 1000, lam_damping, per-frame prior annealing).  Odometry frames
    (fr['rel'] present — see online.frames_from_sim) go through the
    in-graph composition step; absolute frames through the plain step
    with the cheirality fallback."""
    step, step_odo = steps
    lat = []
    ids = online.OnlineIds()
    z0 = jnp.zeros(chunk, jnp.int32)
    active = 0   # host-side window occupancy
    n_lmks = 0   # host mirror of ob.n_lmks: no device read on the hot path
    cam_min = []  # per active camera: min online lmk id it observes
    n_fallback = 0
    for i, fr in enumerate(frames):
        prec = np.full(6, 1e5 if i == 0 else 1000.0)
        t0 = time.time()
        odometry = active and "rel" in fr
        cam = np.asarray(fr["cam"], np.float64)
        if not odometry and active and not online.cheirality_ok(
                cam, lmk_init[fr["lmk_global"]]):
            # Degenerate arrival init (most of the frame's landmarks behind
            # the camera — the measured corridor stream hands one such
            # frame in 120 under absolute arrivals): no solver converges a
            # reprojection factor from the wrong side of the z = 0 plane,
            # so a real frontend never submits one.  Motion-model
            # fallback: start from the previous camera's estimate.
            cam = np.asarray(ob.state.v[0].mean[active - 1], np.float64)
            n_fallback += 1
        do_evict = active + 1 > lag
        if do_evict:
            # Host-side prediction of evict_frames' landmark compaction
            # cut (lmin = min landmark id observed by a surviving camera):
            # the frontend fed every observation, so no device read is
            # needed and the whole frame stays one dispatch.  The quality
            # pass asserts the device agrees (see main()).
            lmin = min((m for m in cam_min[n_evict:] if m is not None),
                       default=0)
            del cam_min[:n_evict]
            cam_min = [None if m is None else m - lmin for m in cam_min]
            ids.shift(lmin)
            n_lmks -= lmin
            active -= n_evict
        oid, new_sel = ids.resolve(fr["lmk_global"], n_lmks)
        cam_min.append(int(oid.min()) if len(oid) else None)
        n_lmks += len(new_sel)
        active += 1
        if odometry:
            # Arrival pose AND new-landmark placement (camera-frame
            # triangulation stand-in: X_window = R^T (X_cam - t), bounded
            # error at any horizon) are computed IN-GRAPH from the
            # previous camera's estimate — see _make_step's step_odo.
            r_rel, t_rel = fr["rel"]
            lmk_cam_new = np.asarray(fr["lmk_cam"][new_sel],
                                     np.float64).reshape(-1, 3)
            ob = step_odo(ob, jnp.asarray(r_rel), jnp.asarray(t_rel),
                          jnp.asarray(prec), z0,
                          jnp.asarray(_pad(oid, chunk)),
                          jnp.asarray(_pad(fr["obs_uv"], chunk)),
                          jnp.int32(len(oid)),
                          jnp.asarray(_pad(lmk_cam_new, chunk)),
                          jnp.int32(len(new_sel)),
                          cfg, sweeps_per_frame, do_evict, n_evict)
        else:
            new_lmks = np.asarray(
                lmk_init[fr["lmk_global"][new_sel]],
                np.float64).reshape(-1, 3)
            ob = step(ob, jnp.asarray(cam), jnp.asarray(prec), z0,
                      jnp.asarray(_pad(oid, chunk)),
                      jnp.asarray(_pad(fr["obs_uv"], chunk)),
                      jnp.int32(len(oid)),
                      jnp.asarray(_pad(new_lmks, chunk)),
                      jnp.int32(len(new_lmks)),
                      cfg, sweeps_per_frame, do_evict, n_evict)
        ob.state.v[0].mean.block_until_ready()  # serving sync point
        lat.append(time.time() - t0)
        if on_frame is not None:
            assert int(ob.n_lmks) == n_lmks, (i, int(ob.n_lmks), n_lmks)
            on_frame(i, ob)
    if n_fallback:
        print(f"[serving] cheirality fallback on {n_fallback} arrival(s)",
              flush=True)
    return ob, lat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--lpc", type=int, default=40,
                    help="new landmarks per camera")
    ap.add_argument("--lag", type=int, default=16,
                    help="fixed-lag window (cameras)")
    ap.add_argument("--n_evict", type=int, default=4)
    ap.add_argument("--sweeps_per_frame", type=int, default=10,
                    help="per-frame sweep budget (the streaming tests' "
                         "converged setting, tests/test_online.py)")
    ap.add_argument("--arrivals", choices=("absolute", "odometry"),
                    default="absolute",
                    help="arrival init model: the sim's absolute noisy "
                         "poses (lever-arm noise growth — fine to ~120 "
                         "frames) or tracking-style odometry composition "
                         "(long-horizon; see online.frames_from_sim)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gbp_tpu.core.sweep import GBPConfig
    from gbp_tpu.models import ba, online

    dev = jax.devices()[0]
    sim = ba.simulate_corridor(n_cams=args.frames, lmks_per_cam=args.lpc,
                               window=3, seed=0)
    frames = online.frames_from_sim(
        sim, odometry_sigma=(0.02, 0.05) if args.arrivals == "odometry"
        else None)
    max_obs = max(len(f["lmk_global"]) for f in frames)
    chunk = int(np.ceil(max_obs / 64) * 64)
    f_px = sim["k"][0]

    def fresh():
        return online.create(
            cam_capacity=args.lag, lmk_capacity=2048,
            obs_capacity=8192, chunk=chunk,
            pix_sigma_n=sim["pix_sigma"] / f_px,
            lmk_prior_prec=1000.0)

    # The corridor recipe (tests/test_online.py:174-182) plus
    # num_undamped_iters=0: in a stream, arrivals relinearize factors every
    # frame, so the post-relin undamped window would keep ~60% of all
    # sweeps undamped — sustained chain oscillation (measured: max ARE
    # 1920 px at 6 undamped vs 190 at 0, same 120-frame stream).
    cfg = GBPConfig(eta_damping=0.4, lam_damping=0.4, num_undamped_iters=0,
                    min_linear_iters=8)
    print(f"[serving] {args.frames} frames, <= {max_obs} obs/frame "
          f"(chunk {chunk}), lag {args.lag} cams, "
          f"{args.sweeps_per_frame} sweeps/frame on {dev}", flush=True)

    # --- timed pass -----------------------------------------------------
    t0 = time.time()
    steps = _make_step(online, jax)
    ob, lat = _stream(fresh(), frames, sim["lmk_init"], chunk, cfg,
                      args.sweeps_per_frame, args.lag, args.n_evict,
                      online, jnp, steps)
    total = time.time() - t0
    # Steady state = after every jitted piece has compiled: first frame
    # (add/run/weaken), first eviction frame.  Everything later must reuse
    # compiles — asserted via the jit cache sizes: absolute arrivals use
    # the plain step's evict-off/on variants; odometry arrivals use the
    # plain step once (frame 0) plus the odometry step's two variants.
    # Anything more means a shape leak recompiled the steady-state loop.
    assert steps[0]._cache_size() + steps[1]._cache_size() <= 3, \
        "fused frame step recompiled"
    first_evict = next(i for i, fr in enumerate(frames) if i + 1 > args.lag)
    steady = np.asarray(lat[first_evict + 1:])
    fps = 1.0 / np.median(steady)
    print(f"[serving] timed pass: {total:.1f}s total; steady-state "
          f"{fps:.1f} frames/s (p50 {np.median(steady)*1e3:.1f} ms, "
          f"p95 {np.percentile(steady, 95)*1e3:.1f} ms/frame, "
          f"{len(steady)} frames)", flush=True)

    # --- quality pass (uncounted): per-frame ARE over the active window --
    ares = []

    def on_frame(i, ob):
        m = ob.graph.fblocks[0].count
        px_scale = np.full((m, 2), f_px)
        are = float(ba.avg_reprojection_error(ob.graph, ob.state,
                                              px_scale=px_scale))
        ares.append(are)

    _stream(fresh(), frames, sim["lmk_init"], chunk, cfg,
            args.sweeps_per_frame, args.lag, args.n_evict, online, jnp,
            steps, on_frame=on_frame)
    ares_np = np.asarray(ares)
    assert np.isfinite(ares_np).all(), "non-finite ARE in stream"
    print(f"[serving] quality pass: ARE median {np.median(ares_np):.3f}px, "
          f"max {ares_np.max():.3f}px, final {ares_np[-1]:.3f}px", flush=True)

    out = {
        "platform": str(dev),
        "arrivals": args.arrivals,
        "frames": args.frames,
        "fixed_lag_cams": args.lag,
        "n_evict": args.n_evict,
        "sweeps_per_frame": args.sweeps_per_frame,
        "max_obs_per_frame": int(max_obs),
        "frames_per_s_steady": round(float(fps), 2),
        "frame_latency_ms_p50": round(float(np.median(steady)) * 1e3, 3),
        "frame_latency_ms_p95": round(
            float(np.percentile(steady, 95)) * 1e3, 3),
        "steady_frames_measured": int(len(steady)),
        "are_px_median": round(float(np.median(ares_np)), 4),
        "are_px_max": round(float(ares_np.max()), 4),
        "are_px_final": round(float(ares_np[-1]), 4),
        "note": ("whole frame = ONE jitted program (evict+add+sweeps+"
                 "anneal) + one sync; the fusion took the axon-tunnel "
                 "run from 15.0 to ~30 frames/s — remaining latency is "
                 "the tunnel's per-dispatch host<->device round trip, "
                 "not compute"),
    }
    path = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "artifacts", "serving_tpu_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[serving] wrote {path}")


if __name__ == "__main__":
    main()
