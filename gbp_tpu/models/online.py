"""Incremental (online) bundle adjustment: grow the graph without recompiling.

The reference is batch-only (load a BAL file, iterate — SURVEY.md §3.1), but
the system it prototypes is an incremental Spatial-AI backend (arXiv:
1910.14139 §5: keyframes and landmarks arrive continuously).  Under XLA,
naive graph growth is a new array shape per frame — and a fresh ~10 s
compile, which is unusable for serving.

This module keeps every array at a FIXED capacity and grows the graph by
value only:

  * cameras / landmarks / observations live in capacity-sized arrays with an
    active prefix (counts are traced scalars in the pytree);
  * inactive factor rows are `valid=False` (inert: the sweep masks them —
    same mechanism as ELL clone padding); inactive variables hold an
    identity prior so their belief solves stay finite;
  * `add_frame` writes one camera + up to `chunk` observations (+ new
    landmarks) via `lax.dynamic_update_slice` at traced offsets and
    linearizes JUST the new rows — a jitted update with static shapes;
  * sweeps run on the same static-shape graph, so the whole serving loop
    (add frame -> sweeps -> read out) compiles exactly once.

The generic sweep path is used (plain row layout: adjacency changes as
observations arrive, so the ELL/CM layouts — which bake the grouping in —
stay a batch-mode optimization; re-layout + `sweep_cm.prepare` on a
snapshot remains available for offline refinement).
"""
from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.graph import FactorBlock, Graph, VariableBlock
from gbp_tpu.core.sweep import (
    GBPConfig,
    GBPState,
    FactorState,
    VariableState,
    f32_exact,
)
from gbp_tpu.core import sweep as sweep_mod
from gbp_tpu.factors import reprojection


class OnlineBA(flax.struct.PyTreeNode):
    """Fixed-capacity BA problem + GBP state (a pytree; update functionally)."""

    graph: Graph
    state: GBPState
    n_cams: jnp.ndarray  # [] int32 active cameras
    n_lmks: jnp.ndarray  # [] int32 active landmarks
    n_obs: jnp.ndarray  # [] int32 active observations
    # Marginalization info absorbed into landmark priors by evict_frames
    # (fixed-lag smoothing).  Kept separately so weaken_landmark_priors
    # anneals only the artificial arrival priors, never real absorbed
    # measurement information.
    marg_eta: jnp.ndarray | None = None  # [lmk_capacity, 3]
    marg_lam: jnp.ndarray | None = None  # [lmk_capacity, 3, 3]
    chunk: int = flax.struct.field(pytree_node=False, default=0)
    # New-landmark prior precision.  Streaming needs a firmer prior than
    # batch BA: a landmark seen from ONE view has unobservable depth, and
    # with a weak prior its belief mean wanders (to negative depth in the
    # worst case, which NaNs the next frame's reprojection in f32).  The
    # prior is relaxed per-frame once multi-view coverage accumulates —
    # the streaming analogue of the reference's prior annealing.
    lmk_prior_prec: float = flax.struct.field(pytree_node=False, default=50.0)


def create(cam_capacity: int, lmk_capacity: int, obs_capacity: int,
           chunk: int = 256, pix_sigma_n: float = 0.002,
           lmk_prior_prec: float = 50.0, huber: float | None = 2.0,
           dtype=jnp.float32) -> OnlineBA:
    """Empty fixed-capacity problem (normalized-coordinate reprojection).

    pix_sigma_n: measurement sigma in NORMALIZED image coordinates
    (pixel sigma / focal length).  chunk: max observations per add_frame
    call (the static batch size of the update).  huber: Mahalanobis
    threshold in std-devs (robustified by default: every arrival enters
    with a single-view extrapolated init whose first-sweep residuals are
    10-30x sigma, and `evict_frames` permanently freezes messages into
    marginalization priors — un-robustified squared loss lets one
    mid-recovery eviction bake that transient into the window, which
    measurably compounds to divergence after ~60-100 streamed frames)."""
    ftype = reprojection.reprojection_normalized()
    d_c, d_l, zd = 6, 3, 2
    cams = VariableBlock(
        prior_eta=jnp.zeros((cam_capacity, d_c), dtype),
        prior_lam=jnp.tile(jnp.eye(d_c, dtype=dtype), (cam_capacity, 1, 1)),
        name="cam")
    lmks = VariableBlock(
        prior_eta=jnp.zeros((lmk_capacity, d_l), dtype),
        prior_lam=jnp.tile(jnp.eye(d_l, dtype=dtype), (lmk_capacity, 1, 1)),
        name="lmk")
    fb = FactorBlock(
        adj=(jnp.zeros(obs_capacity, jnp.int32),
             jnp.zeros(obs_capacity, jnp.int32)),
        z=jnp.zeros((obs_capacity, zd), dtype),
        prec=jnp.full((obs_capacity, zd), 1.0 / pix_sigma_n**2, dtype),
        valid=jnp.zeros(obs_capacity, bool),
        ftype=ftype, vblocks=(0, 1), dofs=(d_c, d_l),
        huber=huber, name="reproj")
    graph = Graph(vblocks=(cams, lmks), fblocks=(fb,))
    t = d_c + d_l
    state = GBPState(
        v=(VariableState(eta=cams.prior_eta, lam=cams.prior_lam,
                         mean=jnp.zeros((cam_capacity, d_c), dtype)),
           VariableState(eta=lmks.prior_eta, lam=lmks.prior_lam,
                         mean=jnp.zeros((lmk_capacity, d_l), dtype))),
        f=(FactorState(
            linpoint=jnp.zeros((obs_capacity, t), dtype),
            jac=jnp.zeros((obs_capacity, zd, t), dtype),
            r0=jnp.zeros((obs_capacity, zd), dtype),
            msg_eta=(jnp.zeros((obs_capacity, d_c), dtype),
                     jnp.zeros((obs_capacity, d_l), dtype)),
            msg_lam=(jnp.zeros((obs_capacity, d_c, d_c), dtype),
                     jnp.zeros((obs_capacity, d_l, d_l), dtype)),
            since_relin=jnp.zeros(obs_capacity, jnp.int32)),),
    )
    return OnlineBA(graph=graph, state=state,
                    n_cams=jnp.int32(0), n_lmks=jnp.int32(0),
                    n_obs=jnp.int32(0),
                    marg_eta=jnp.zeros((lmk_capacity, d_l), dtype),
                    marg_lam=jnp.zeros((lmk_capacity, d_l, d_l), dtype),
                    chunk=chunk,
                    lmk_prior_prec=lmk_prior_prec)


def add_frame(ob: OnlineBA, cam_mean, cam_prior_prec,
              obs_cam_local, obs_lmk, obs_uv, obs_count,
              new_lmk_means, new_lmk_count, check: bool = True) -> OnlineBA:
    """Capacity-checked wrapper around the jitted update (_add_frame_jit).

    Counts are concrete between jitted calls, so overflow is caught HERE —
    inside jit, writes past capacity would be silently dropped and the
    counts would still advance, corrupting the map.  The check costs one
    device round trip (it must sync the in-flight state); latency-critical
    loops that pre-size capacity can pass check=False and audit counts
    themselves between keyframes."""
    if check:
        nc, nl, no = jax.device_get((ob.n_cams, ob.n_lmks, ob.n_obs))
        if int(nc) + 1 > ob.graph.vblocks[0].count:
            raise ValueError("camera capacity exhausted")
        if int(nl) + int(new_lmk_count) > ob.graph.vblocks[1].count:
            raise ValueError("landmark capacity exhausted")
        if int(no) + int(obs_count) > ob.graph.fblocks[0].count:
            raise ValueError("observation capacity exhausted")
    return _add_frame_jit(ob, cam_mean, cam_prior_prec, obs_cam_local,
                          obs_lmk, obs_uv, obs_count, new_lmk_means,
                          new_lmk_count)


@jax.jit
@f32_exact
def _add_frame_jit(ob: OnlineBA, cam_mean, cam_prior_prec,
                   obs_cam_local, obs_lmk, obs_uv, obs_count,
                   new_lmk_means, new_lmk_count) -> OnlineBA:
    """Append one camera, `new_lmk_count` landmarks, and `obs_count`
    observations (arrays padded to the static chunk size).

    obs_cam_local: [chunk] 0 for the NEW camera, else (negative) offset from
    it — so callers can reference recent cameras without knowing absolute
    ids.  obs_lmk: [chunk] landmark ids, where id >= current n_lmks refers
    to the new landmarks appended by this same call.  All jitted: one
    compile for the whole serving loop."""
    g = ob.graph
    fb = g.fblocks[0]
    dt = fb.z.dtype
    ci = ob.n_cams
    chunk = ob.chunk

    # --- camera ---------------------------------------------------------
    cam_mean = cam_mean.astype(dt)
    pp = jnp.broadcast_to(jnp.asarray(cam_prior_prec, dt), (6,))
    cams = g.vblocks[0]
    cams = cams.replace(
        prior_eta=jax.lax.dynamic_update_slice(
            cams.prior_eta, (pp * cam_mean)[None], (ci, jnp.int32(0))),
        prior_lam=jax.lax.dynamic_update_slice(
            cams.prior_lam, jnp.diag(pp)[None], (ci, jnp.int32(0), jnp.int32(0))))
    v0 = ob.state.v[0]
    v0 = v0.replace(
        eta=jax.lax.dynamic_update_slice(v0.eta, (pp * cam_mean)[None], (ci, jnp.int32(0))),
        lam=jax.lax.dynamic_update_slice(v0.lam, jnp.diag(pp)[None], (ci, jnp.int32(0), jnp.int32(0))),
        mean=jax.lax.dynamic_update_slice(v0.mean, cam_mean[None], (ci, jnp.int32(0))))

    # --- landmarks ------------------------------------------------------
    li = ob.n_lmks
    lmks = g.vblocks[1]
    new_lmk_means = new_lmk_means.astype(dt)  # [chunk, 3] padded
    lmk_rows = jnp.arange(new_lmk_means.shape[0])
    lmk_on = lmk_rows < new_lmk_count
    # Padded rows target index `capacity` — out of bounds, so the scatter
    # DROPS them (JAX's default scatter mode): nothing outside the active
    # prefix is ever touched and active targets are all distinct.
    tgt = jnp.where(lmk_on, li + lmk_rows, lmks.count)
    lpp = jnp.asarray(ob.lmk_prior_prec, dt)

    def put(a, new_rows):
        return a.at[tgt].set(new_rows.astype(a.dtype))

    lmk_eta = lpp * new_lmk_means
    lmk_lam = jnp.tile(jnp.eye(3, dtype=dt)[None], (chunk, 1, 1)) * lpp
    lmks = lmks.replace(prior_eta=put(lmks.prior_eta, lmk_eta),
                        prior_lam=put(lmks.prior_lam, lmk_lam))
    v1 = ob.state.v[1]
    v1 = v1.replace(eta=put(v1.eta, lmk_eta),
                    lam=put(v1.lam, lmk_lam),
                    mean=put(v1.mean, new_lmk_means))

    # --- observations ---------------------------------------------------
    oi = ob.n_obs
    rows = jnp.arange(chunk)
    on = rows < obs_count
    cam_ids = (ci + obs_cam_local).astype(jnp.int32)
    lmk_ids = obs_lmk.astype(jnp.int32)
    # Same dropped-out-of-bounds scheme as the landmarks.
    row_tgt = jnp.where(on, oi + rows, fb.z.shape[0])

    def putr(a, new_rows):
        return a.at[row_tgt].set(new_rows.astype(a.dtype))

    fb = fb.replace(
        adj=(putr(fb.adj[0], cam_ids), putr(fb.adj[1], lmk_ids)),
        z=putr(fb.z, obs_uv.astype(dt)),
        valid=putr(fb.valid, jnp.ones_like(on)),
    )
    g = g.replace(vblocks=(cams, lmks), fblocks=(fb,))

    # linearize ONLY the new rows at the current means
    x_new = jnp.concatenate(
        [v0.mean[jnp.where(on, cam_ids, 0)], v1.mean[jnp.where(on, lmk_ids, 0)]],
        axis=-1)
    chunk_fb = fb.replace(
        adj=(cam_ids, lmk_ids),
        z=jnp.where(on[:, None], obs_uv.astype(dt), 0.0),
        prec=fb.prec[:chunk], valid=None)
    jac, r0 = sweep_mod.linearize_block(chunk_fb, x_new)
    fs = ob.state.f[0]
    fs = fs.replace(
        linpoint=putr(fs.linpoint, x_new),
        jac=putr(fs.jac, jac),
        r0=putr(fs.r0, r0),
        msg_eta=(putr(fs.msg_eta[0], jnp.zeros((chunk, 6), dt)),
                 putr(fs.msg_eta[1], jnp.zeros((chunk, 3), dt))),
        msg_lam=(putr(fs.msg_lam[0], jnp.zeros((chunk, 6, 6), dt)),
                 putr(fs.msg_lam[1], jnp.zeros((chunk, 3, 3), dt))),
        since_relin=putr(fs.since_relin, jnp.zeros(chunk, jnp.int32)),
    )
    state = GBPState(v=(v0, v1), f=(fs,))
    return ob.replace(graph=g, state=state,
                      n_cams=ci + 1,
                      n_lmks=li + new_lmk_count.astype(jnp.int32),
                      n_obs=oi + obs_count.astype(jnp.int32))


@jax.jit
@f32_exact
def weaken_landmark_priors(ob: OnlineBA, factor=0.5, floor=1.0) -> OnlineBA:
    """Scale every ACTIVE landmark's ARRIVAL prior by `factor`, clamped so
    the diagonal never drops below `floor` — called once per frame this gives
    each landmark an age-dependent annealed prior: firm while single-view,
    relaxing as multi-view coverage accumulates (the streaming analogue of
    the reference's weaken_priors schedule).

    Only the artificial arrival prior is annealed: marginalization info
    absorbed by `evict_frames` (real measurement information) is subtracted
    out before scaling and added back after."""
    lmks = ob.graph.vblocks[1]
    dt = lmks.prior_eta.dtype
    on = jnp.arange(lmks.count) < ob.n_lmks
    ann_eta = lmks.prior_eta - (0.0 if ob.marg_eta is None else ob.marg_eta)
    ann_lam = lmks.prior_lam - (0.0 if ob.marg_lam is None else ob.marg_lam)
    diag = jnp.diagonal(ann_lam, axis1=1, axis2=2)
    # per-variable scale: factor, but not past the floor
    cur = jnp.max(diag, axis=1)
    s = jnp.where(on, jnp.maximum(jnp.asarray(factor, dt),
                                  floor / jnp.maximum(cur, 1e-20)), 1.0)
    s = jnp.minimum(s, 1.0).astype(dt)
    new_eta = ann_eta * s[:, None] + (0.0 if ob.marg_eta is None else ob.marg_eta)
    new_lam = ann_lam * s[:, None, None] + (0.0 if ob.marg_lam is None else ob.marg_lam)
    return ob.replace(graph=ob.graph.replace(vblocks=(
        ob.graph.vblocks[0],
        lmks.replace(prior_eta=new_eta, prior_lam=new_lam))))


@jax.jit
@f32_exact
def weaken_camera_priors(ob: OnlineBA, factor=0.7, floor=30.0) -> OnlineBA:
    """Anneal ACTIVE cameras' arrival priors by `factor` down to `floor`.

    The fixed-lag twin of `weaken_landmark_priors`: each camera arrives with
    a firm prior (new pose estimates are single-view extrapolations and the
    corridor/chain regime oscillates under weak priors), which then relaxes
    as multi-view constraints accumulate so the prior stops biasing the
    window solution.  `floor` keeps enough stiffness to prevent the chain
    oscillation; after the first eviction the absorbed marginal priors carry
    the gauge.  Cameras receive no marginalization info (evicting a camera
    removes its factors entirely), so the whole prior is annealable."""
    cams = ob.graph.vblocks[0]
    dt = cams.prior_eta.dtype
    on = jnp.arange(cams.count) < ob.n_cams
    diag = jnp.diagonal(cams.prior_lam, axis1=1, axis2=2)
    cur = jnp.max(diag, axis=1)
    s = jnp.where(on, jnp.maximum(jnp.asarray(factor, dt),
                                  floor / jnp.maximum(cur, 1e-20)), 1.0)
    s = jnp.minimum(s, 1.0).astype(dt)
    return ob.replace(graph=ob.graph.replace(vblocks=(
        cams.replace(prior_eta=cams.prior_eta * s[:, None],
                     prior_lam=cams.prior_lam * s[:, None, None]),
        ob.graph.vblocks[1])))


@functools.partial(jax.jit, static_argnums=(1, 2))
@f32_exact
def evict_frames(ob: OnlineBA, n_evict: int,
                 marg_discount: float = 0.5) -> OnlineBA:
    """Fixed-lag eviction: marginalize the oldest `n_evict` cameras out of
    the window so the problem serves indefinitely (VERDICT r2 item 2; the
    standard fixed-lag smoother of arXiv:1910.14139 §5's streaming setting).

    GBP makes marginalization local: a factor's message to its landmark IS
    the marginal of (factor potential + camera cavity) onto that landmark, so
    evicting a camera = freezing each attached factor's current landmark-slot
    message into the landmark's prior, then deleting the factor and the
    camera.  Landmarks below the lowest id still referenced by a surviving
    factor (ids are first-sighting-ordered, so old landmarks fall out of the
    window together with their observers) are evicted with their absorbed
    estimates.  Everything is static-shape: factor rows compact by a stable
    argsort, camera arrays shift by the static `n_evict`, landmark arrays
    roll by the traced eviction count — one compile per `n_evict` for the
    whole serving loop.
    """
    g = ob.graph
    fb = g.fblocks[0]
    fs = ob.state.f[0]
    cams, lmks = g.vblocks
    v0, v1 = ob.state.v
    dt = fb.z.dtype
    ccap, lcap, ocap = cams.count, lmks.count, fb.z.shape[0]
    d_c, d_l = 6, 3

    ev = fb.valid & (fb.adj[0] < n_evict)  # factors losing their camera
    keep = fb.valid & ~ev

    # --- absorb evicted factors' landmark messages into landmark priors ----
    # marg_discount < 1 is the standard fixed-lag forgetting factor: the
    # frozen message was computed at the moment of eviction — possibly
    # mid-recovery from an arrival transient — and absorbing it at full
    # strength lets accumulated bias out-vote fresh arrival information.
    # Measured on a 120-frame corridor stream (lag 16, the serving bench
    # recipe): 0.5 vs 1.0 is a small but consistent tail-quality win
    # (last-5-frame ARE 1.9-3.6 px vs 2.3-3.6 px, same median); the
    # first-order stream stabilizers are the stiff camera anneal floor and
    # num_undamped_iters=0 (see bench/serving.py), not this knob.
    w = (marg_discount * ev.astype(dt))[:, None]
    packed_msg = jnp.concatenate(
        [fs.msg_eta[1], fs.msg_lam[1].reshape(ocap, -1)], axis=1) * w
    absorbed = jax.ops.segment_sum(packed_msg, fb.adj[1], num_segments=lcap)
    marg_eta = ob.marg_eta + absorbed[:, :d_l]
    marg_lam = ob.marg_lam + absorbed[:, d_l:].reshape(lcap, d_l, d_l)
    prior_eta_l = lmks.prior_eta + absorbed[:, :d_l]
    prior_lam_l = lmks.prior_lam + absorbed[:, d_l:].reshape(lcap, d_l, d_l)

    # --- compact factor rows: survivors to the front, original order -------
    order = jnp.argsort(~keep, stable=True)
    keep_p = keep[order]
    kf = keep.astype(dt)[:, None]
    # One wide-row gather for all float factor state (narrow per-array
    # gathers serialize on TPU); dead rows are zeroed first so they are
    # inert wherever they land (belief sums rely on zero messages).
    wide = jnp.concatenate([
        fs.linpoint, fs.jac.reshape(ocap, -1), fs.r0,
        fs.msg_eta[0] * kf, fs.msg_eta[1] * kf,
        fs.msg_lam[0].reshape(ocap, -1) * kf,
        fs.msg_lam[1].reshape(ocap, -1) * kf,
        fb.z,
    ], axis=1)[order]
    t = fs.linpoint.shape[1]
    zd = fb.z.shape[1]
    offs = np.cumsum([0, t, zd * t, zd, d_c, d_l, d_c * d_c, d_l * d_l, zd])
    cut = lambda i: wide[:, offs[i]:offs[i + 1]]

    adj0 = jnp.where(keep_p, jnp.maximum(fb.adj[0][order] - n_evict, 0), 0)
    adj1_p = fb.adj[1][order]
    # Landmark eviction threshold: the lowest id a surviving factor needs.
    lmin = jnp.min(jnp.where(keep_p, adj1_p, ob.n_lmks))
    adj1 = jnp.where(keep_p, jnp.maximum(adj1_p - lmin, 0), 0)

    new_fb = fb.replace(
        adj=(adj0.astype(jnp.int32), adj1.astype(jnp.int32)),
        z=cut(7), prec=fb.prec[order], valid=keep_p)
    new_fs = fs.replace(
        linpoint=cut(0), jac=cut(1).reshape(ocap, zd, t), r0=cut(2),
        msg_eta=(cut(3), cut(4)),
        msg_lam=(cut(5).reshape(ocap, d_c, d_c), cut(6).reshape(ocap, d_l, d_l)),
        since_relin=jnp.where(keep_p, fs.since_relin[order], 0),
    )

    # --- shift cameras down by n_evict (static slice + inert tail) ---------
    eye_c = jnp.tile(jnp.eye(d_c, dtype=dt)[None], (n_evict, 1, 1))
    shift = lambda a, fill: jnp.concatenate([a[n_evict:], fill], axis=0)
    z6 = jnp.zeros((n_evict, d_c), dt)
    new_cams = cams.replace(prior_eta=shift(cams.prior_eta, z6),
                            prior_lam=shift(cams.prior_lam, eye_c))
    new_v0 = VariableState(eta=shift(v0.eta, z6), lam=shift(v0.lam, eye_c),
                           mean=shift(v0.mean, z6))

    # --- roll landmarks down by the traced lmin (inert wrapped tail) -------
    rows_l = jnp.arange(lcap)
    live = rows_l < (ob.n_lmks - lmin)
    eye_l = jnp.eye(d_l, dtype=dt)

    def roll_l(a, identity=False):
        r = jnp.roll(a, -lmin, axis=0)
        if identity:
            fill = jnp.broadcast_to(eye_l, a.shape)
            return jnp.where(live[:, None, None], r, fill)
        mask = live.reshape((lcap,) + (1,) * (a.ndim - 1))
        return jnp.where(mask, r, jnp.zeros_like(r))

    new_lmks = lmks.replace(prior_eta=roll_l(prior_eta_l),
                            prior_lam=roll_l(prior_lam_l, identity=True))
    new_v1 = VariableState(eta=roll_l(v1.eta), lam=roll_l(v1.lam, identity=True),
                           mean=roll_l(v1.mean))

    return ob.replace(
        graph=g.replace(vblocks=(new_cams, new_lmks), fblocks=(new_fb,)),
        state=GBPState(v=(new_v0, new_v1), f=(new_fs,)),
        n_cams=ob.n_cams - n_evict,
        n_lmks=ob.n_lmks - lmin,
        n_obs=jnp.sum(keep).astype(jnp.int32),
        marg_eta=roll_l(marg_eta),
        marg_lam=roll_l(marg_lam),
    )


@functools.partial(jax.jit, static_argnums=2)
@f32_exact
def run(ob: OnlineBA, cfg: GBPConfig, n_iters: int) -> OnlineBA:
    """n_iters synchronous sweeps on the current (masked) graph."""
    state = sweep_mod.run(ob.graph, ob.state, cfg, n_iters)
    return ob.replace(state=state)


def snapshot(ob: OnlineBA):
    """Host-side copy of the ACTIVE subproblem (for offline refinement with
    the batch/CM paths, metrics, or export)."""
    nc = int(ob.n_cams)
    nl = int(ob.n_lmks)
    no = int(ob.n_obs)
    fb = ob.graph.fblocks[0]
    return dict(
        cam_means=np.asarray(ob.state.v[0].mean[:nc]),
        lmk_means=np.asarray(ob.state.v[1].mean[:nl]),
        cam_ids=np.asarray(fb.adj[0][:no]),
        lmk_ids=np.asarray(fb.adj[1][:no]),
        z=np.asarray(fb.z[:no]),
    )


def frames_from_sim(sim, odometry_sigma=None, odometry_seed=1234):
    """Group a batch sim's observations into per-camera arrival-order frames
    in GLOBAL landmark ids and normalized coordinates.  The caller owns the
    global→online id remap (see `OnlineIds`): after `evict_frames`
    compacts the landmark block, any precomputed online ids go stale, so a
    fixed-lag stream MUST track ids frame by frame — the standard frontend
    bookkeeping (tests/test_online.py:184-209 is the reference loop).  Used
    by the serving benchmark (bench/serving.py).

    odometry_sigma=(rot, trans): additionally attach a noisy RELATIVE
    camera motion `rel` = (R_rel, t_rel) per frame (world->cam convention:
    T_i = rel ∘ T_{i-1}), synthesized from cam_truth — the odometry
    measurement a tracking frontend provides.  Why it matters: the sim's
    iid noise on the [omega, t] ABSOLUTE parameterization carries a lever
    arm (|t| grows along the trajectory, so depth error ~ theta * |x|);
    by frame ~80 of a corridor some arrivals put most of their own
    landmarks behind the camera — no streaming window survives absolute
    inits whose effective noise grows without bound, and no real frontend
    produces them.  Odometry arrivals have lever arm ~ one step."""
    k = sim["k"]
    uv_n = np.stack([(sim["obs"][:, 0] - k[2]) / k[0],
                     (sim["obs"][:, 1] - k[3]) / k[1]], axis=1)
    frames = [dict(cam=sim["cam_init"][c],
                   lmk_global=sim["lmk_ids"][sel].astype(np.int64),
                   obs_uv=uv_n[sel])
              for c in range(sim["cam_init"].shape[0])
              for sel in (np.flatnonzero(sim["cam_ids"] == c),)]
    if odometry_sigma is not None:
        rng = np.random.default_rng(odometry_seed)
        sr, st = odometry_sigma
        tru = np.asarray(sim["cam_truth"], np.float64)
        for i, fr in enumerate(frames):
            # Camera-FRAME positions of this frame's landmark inits (the
            # triangulation stand-in: a tracking frontend knows landmarks
            # relative to the camera that sees them; the relative distance
            # is a few steps, so the error stays ~lmk_noise regardless of
            # trajectory length — unlike any absolute-frame transform).
            r_i = _so3_exp_np(tru[i][:3])
            fr["lmk_cam"] = (sim["lmk_init"][fr["lmk_global"]] @ r_i.T
                             + tru[i][3:])
            if i == 0:
                continue
            r_prev = _so3_exp_np(tru[i - 1][:3])
            r_rel = r_i @ r_prev.T
            t_rel = tru[i][3:] - r_rel @ tru[i - 1][3:]
            r_rel = _so3_exp_np(rng.normal(0.0, sr, 3)) @ r_rel
            fr["rel"] = (r_rel, t_rel + rng.normal(0.0, st, 3))
    return frames


def _so3_exp_np(w):
    th = float(np.linalg.norm(w))
    k = np.array([[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]],
                  [-w[1], w[0], 0.0]])
    if th < 1e-12:
        return np.eye(3) + k
    return (np.eye(3) + np.sin(th) / th * k
            + (1.0 - np.cos(th)) / th ** 2 * (k @ k))


def _so3_log_np(r):
    c = np.clip((np.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    th = float(np.arccos(c))
    v = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    if th < 1e-12:
        return v / 2.0
    return th / (2.0 * np.sin(th)) * v


def cheirality_ok(cam6, pts, min_frac=0.95, eps=0.05):
    """Host-side arrival sanity check: does this world->cam pose put at
    least `min_frac` of `pts` [n, 3] in FRONT of the camera (z > eps)?
    Simulated init noise on a near-pi/2 rotation occasionally swings the
    optical axis far enough that a frame's own landmarks sit behind it —
    no solver converges a reprojection factor from the wrong side of the
    z = 0 plane, so a streaming frontend must catch the init and fall
    back to a motion-model pose (bench/serving.py's loop)."""
    r = _so3_exp_np(np.asarray(cam6[:3], np.float64))
    z = (np.asarray(pts, np.float64) @ r.T + np.asarray(cam6[3:]))[:, 2]
    return z.size == 0 or float((z > eps).mean()) >= min_frac


class OnlineIds:
    """Host-side global→online landmark id map for a fixed-lag stream.

    `evict_frames(ob, n)` drops the oldest cameras and COMPACTS landmarks:
    ids below the eviction cut disappear and the rest shift down by the
    cut.  `shift(lmin)` mirrors that on the host; a re-observation of a
    marginalized landmark re-enters as a NEW landmark (the standard
    fixed-lag frontend semantics; its evicted mass lives on in the
    marginalization priors)."""

    def __init__(self):
        self._map = {}

    def shift(self, lmin: int):
        self._map = {g: i - lmin for g, i in self._map.items() if i >= lmin}

    def resolve(self, lmk_global, n_lmks: int):
        """Map one frame's global ids to online ids, allocating fresh ids
        (starting at n_lmks) for unseen/evicted landmarks.  Returns
        (online_ids [n_obs], new_sel) where new_sel indexes the frame's
        observation list at each first sighting — the caller supplies the
        matching init positions (absolute inits or camera-frame
        triangulations; see bench/serving.py)."""
        ids, new_sel = [], []
        for j, g in enumerate(np.asarray(lmk_global)):
            g = int(g)
            if g not in self._map:
                self._map[g] = n_lmks + len(new_sel)
                new_sel.append(j)
            ids.append(self._map[g])
        return (np.asarray(ids, np.int32), np.asarray(new_sel, np.int64))
