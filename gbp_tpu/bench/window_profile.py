"""Stage-level on-chip profile of the CM sweep at large camera counts.

VERDICT r3 weak #3: the camera-window table kernels were modeled to cut
~14 MXU table passes to ~2 at Venice-scale camera counts, but measured
only +12.5% end-to-end at 1280 cams — AND the per-factor rate at 1280
cams is ~4x worse than the 64-cam bench even though the windowed dot
width equals the 64-cam full-table width.  Something other than the
table dots scales with camera count.  This harness times each sweep
stage IN ISOLATION (its own fori_loop with a data dependency so XLA
cannot hoist the stage out of the loop) at both scales, window on/off,
on the round-4 FUSED path (in-kernel ELL reconstruction, static-slice
table prep — core/sweep_cm.CMGraph.ell_fused):

  tabprep      static-slice window/ELL table stacks (window_tables +
               ell_tables; the pre-fusion expand_ell stage is gone)
  relin        fused_relin_cm_tab[blk][_ell] kernel
  messages     fused_messages_cm_tab[blk][_ell] kernel
  segsum       segsum_cm[_blk] one-hot reduction kernel
  other        full - stages (beliefs reshape-sum + solves + glue)

Run ON CHIP (single-client tunnel):

    python -m gbp_tpu.bench.window_profile [--blocks 32] [--cams 40]
        [--lpc 60] [--iters 50]

Writes gbp_tpu/bench/artifacts/window_profile_tpu_r4.json.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time


def _timed(fn, *args, iters, **kw):
    """Median-of-3 wall time of jit(fn) over `iters` fori iterations."""
    import jax

    f = jax.jit(functools.partial(fn, **kw), static_argnums=0)
    out = f(iters, *args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = f(iters, *args)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        ts.append((time.time() - t0) / iters)
    return sorted(ts)[1]


def profile_scene(graph, means, cfg, window, iters, ell_fused=None):
    import jax
    import jax.numpy as jnp

    from gbp_tpu.core import sweep_cm
    from gbp_tpu.core.sweep import f32_exact
    from gbp_tpu.ops import messages_pallas as mp

    cmg = sweep_cm.prepare(graph, segsum_exact=True, window=window,
                           ell_fused=ell_fused)
    assert cmg is not None and cmg.gather_mode == "table"
    state = sweep_cm.init_state(cmg, means)
    fb = cmg.fb
    e, g = fb.ell_slot, 1 - fb.ell_slot
    d0, d1 = fb.dofs
    d_g = fb.dofs[g]
    deg = fb.ell_deg
    zdim = fb.z.shape[-1]
    m = fb.count if fb.n_valid is None else fb.n_valid
    res = {"win_w": int(cmg.win_w), "ell_fused": bool(cmg.ell_fused),
           "n_factors": int(m), "mp": int(cmg.mp),
           "ncpad": int(cmg.win_ncpad) or None}

    # --- full sweep ------------------------------------------------------
    def full(n, st):
        return jax.lax.fori_loop(
            0, n, lambda _, s: sweep_cm.sweep(cmg, s, cfg), st)

    res["full_ms"] = _timed(full, state, iters=iters) * 1e3

    # --- stage inputs (one un-timed prep) ----------------------------------
    vs_e, vs_g = state.v[fb.vblocks[e]], state.v[fb.vblocks[g]]
    fs = state.f
    from gbp_tpu.core import sweep as sweep_mod
    from gbp_tpu.ops.comp_factors import COMP_FACTORS

    params = sweep_mod._kernel_params(cfg, fs.r0.dtype)
    n_args = COMP_FACTORS[fb.ftype.name][1]
    huber = "row" if fb.huber_arr is not None else fb.huber
    interp = sweep_cm._interpret()
    pk = sweep_cm._pack_beliefs(vs_g)
    bwtab = mwtab = tab = lbtab = lmtab = None
    be_e = bl_e = mean_e = None
    if cmg.win_w:
        bwtab, mwtab = sweep_cm.window_tables(cmg, pk)
    else:
        ncp = ((pk.shape[0] + mp.LANE - 1) // mp.LANE) * mp.LANE
        tab = jnp.swapaxes(jnp.pad(pk, ((0, ncp - pk.shape[0]), (0, 0))), 0, 1)
    if cmg.ell_fused:
        lbtab, lmtab = sweep_cm.ell_tables(cmg, vs_e)
    else:
        be_e, bl_e, mean_e = sweep_cm._expand_ell(cmg, vs_e)

    # Every stage loop threads its outputs back into its inputs so XLA
    # cannot hoist the stage as loop-invariant.  Where no natural chaining
    # exists, a ~1e-30-scaled scalar of the output is added to an input —
    # numerically inert, dependency-real.
    leak = lambda x: 1e-30 * x.reshape(-1)[0]

    def relin_loop(n, carry):
        @f32_exact
        def body(_, c):
            lp, jac, r0, srel = c
            if cmg.ell_fused and cmg.win_w:
                return mp.fused_relin_cm_tabblk_ell(
                    params, cmg.ell_starts, cmg.win_starts, lmtab, mwtab,
                    cmg.gidx_cm, cmg.z, cmg.args, lp, jac, r0, srel, cmg.act,
                    d0=d0, d1=d1, z=zdim, comp_name=fb.ftype.name,
                    n_args=n_args, gslot=g, win_w=cmg.win_w, deg=deg,
                    ell_w2=cmg.ell_w2, interpret=interp)
            if cmg.ell_fused:
                return mp.fused_relin_cm_tab_ell(
                    params, cmg.ell_starts, lmtab, tab[d_g + d_g * d_g:],
                    cmg.gidx_cm, cmg.z, cmg.args, lp, jac, r0, srel, cmg.act,
                    d0=d0, d1=d1, z=zdim, comp_name=fb.ftype.name,
                    n_args=n_args, gslot=g, deg=deg, ell_w2=cmg.ell_w2,
                    interpret=interp)
            if cmg.win_w:
                return mp.fused_relin_cm_tabblk(
                    params, cmg.win_starts, mean_e, mwtab, cmg.gidx_cm, cmg.z,
                    cmg.args, lp, jac, r0, srel, cmg.act, d0=d0, d1=d1,
                    z=zdim, comp_name=fb.ftype.name, n_args=n_args, gslot=g,
                    win_w=cmg.win_w, interpret=interp)
            return mp.fused_relin_cm_tab(
                params, mean_e, tab[d_g + d_g * d_g:], cmg.gidx_cm, cmg.z,
                cmg.args, lp, jac, r0, srel, cmg.act, d0=d0, d1=d1, z=zdim,
                comp_name=fb.ftype.name, n_args=n_args, gslot=g,
                interpret=interp)

        return jax.lax.fori_loop(0, n, body, carry)

    res["relin_ms"] = _timed(
        relin_loop, (fs.lp, fs.jac, fs.r0, fs.srel), iters=iters) * 1e3

    def msg_loop(n, carry):
        @f32_exact
        def body(_, msgs):
            me0, ml0, me1, ml1 = msgs
            if cmg.ell_fused and cmg.win_w:
                # 5th output = the folded gathered-slot partials (round 4);
                # not part of this stage's carry.
                return mp.fused_messages_cm_tabblk_ell(
                    params, cmg.ell_starts, cmg.win_starts, fs.jac, fs.lp,
                    fs.r0, cmg.prec, fs.srel, cmg.act, lbtab, bwtab,
                    cmg.gidx_cm, me0, ml0, me1, ml1, d0=d0, d1=d1, z=zdim,
                    prec_full=False, huber=huber, gslot=g, win_w=cmg.win_w,
                    deg=deg, ell_w2=cmg.ell_w2, interpret=interp)[:4]
            if cmg.ell_fused:
                return mp.fused_messages_cm_tab_ell(
                    params, cmg.ell_starts, fs.jac, fs.lp, fs.r0, cmg.prec,
                    fs.srel, cmg.act, lbtab, tab[: d_g + d_g * d_g],
                    cmg.gidx_cm, me0, ml0, me1, ml1, d0=d0, d1=d1, z=zdim,
                    prec_full=False, huber=huber, gslot=g, deg=deg,
                    ell_w2=cmg.ell_w2, interpret=interp)[:4]
            if cmg.win_w:
                return mp.fused_messages_cm_tabblk(
                    params, cmg.win_starts, fs.jac, fs.lp, fs.r0, cmg.prec,
                    fs.srel, cmg.act, be_e, bl_e, bwtab, cmg.gidx_cm,
                    me0, ml0, me1, ml1, d0=d0, d1=d1, z=zdim,
                    prec_full=False, huber=huber, gslot=g, win_w=cmg.win_w,
                    interpret=interp)
            return mp.fused_messages_cm_tab(
                params, fs.jac, fs.lp, fs.r0, cmg.prec, fs.srel, cmg.act,
                be_e, bl_e, tab[: d_g + d_g * d_g], cmg.gidx_cm,
                me0, ml0, me1, ml1, d0=d0, d1=d1, z=zdim, prec_full=False,
                huber=huber, gslot=g, interpret=interp)

        return jax.lax.fori_loop(0, n, body, carry)

    msgs0 = (fs.msg_eta[0], fs.msg_lam[0], fs.msg_eta[1], fs.msg_lam[1])
    res["messages_ms"] = _timed(msg_loop, msgs0, iters=iters) * 1e3

    me_g, ml_g = fs.msg_eta[g], fs.msg_lam[g]
    n_g = graph.vblocks[fb.vblocks[g]].count
    leak = leak

    def segsum_loop(n, carry):
        def body(_, me):
            if cmg.win_w:
                s = mp.segsum_cm_blk(me, ml_g, cmg.gidx_cm, cmg.win_starts,
                                     n_seg=n_g, w=cmg.win_w, exact=True,
                                     interpret=interp)
            else:
                s = mp.segsum_cm(me, ml_g, cmg.gidx_cm, n_seg=n_g, exact=True,
                                 interpret=interp)
            return me + leak(s)

        return jax.lax.fori_loop(0, n, body, carry)

    res["segsum_ms"] = _timed(segsum_loop, me_g, iters=iters) * 1e3

    def tabprep_loop(n, carry):
        def body(_, c):
            vsg, vse = c
            pkx = sweep_cm._pack_beliefs(vsg)
            acc = vsg.eta
            if cmg.win_w:
                bw, mw = sweep_cm.window_tables(cmg, pkx)
                acc = acc + leak(bw) + leak(mw)
            if cmg.ell_fused:
                lb, lm = sweep_cm.ell_tables(cmg, vse)
                acc = acc + leak(lb) + leak(lm)
            elif not cmg.win_w:
                acc = acc + leak(pkx)
            # Thread BOTH blocks through the carry so neither table build is
            # loop-invariant.
            return (vsg.replace(eta=acc), vse.replace(eta=vse.eta + leak(acc)))

        return jax.lax.fori_loop(0, n, body, carry)

    res["tabprep_ms"] = _timed(tabprep_loop, (vs_g, vs_e), iters=iters) * 1e3

    kernels = (res["relin_ms"] + res["messages_ms"] + res["segsum_ms"]
               + res["tabprep_ms"])
    res["other_ms"] = res["full_ms"] - kernels  # beliefs + solves + glue
    res["ns_per_factor"] = res["full_ms"] * 1e6 / m
    if abs(res["other_ms"]) > 0.10 * res["full_ms"]:
        # Isolated stage loops overstate costs that fuse away in context
        # (docs/PERFORMANCE.md lesson 5); when the stage sum disagrees with
        # the full sweep by >10% the per-stage numbers are only usable as
        # RELATIVE comparisons, and the artifact must say so (VERDICT r4
        # weak #5).
        res["note"] = (
            "stage sum deviates from full sweep by "
            f"{res['other_ms'] / res['full_ms']:+.0%}; isolated stage "
            "timings overstate costs that fuse away in context — treat "
            "per-stage numbers as relative comparisons only")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=32)
    ap.add_argument("--cams", type=int, default=40, help="cams per block")
    ap.add_argument("--lpc", type=int, default=60)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--skip_bench_scene", action="store_true")
    ap.add_argument("--unfused", action="store_true",
                    help="profile the pre-fusion path (ell_fused=False)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from gbp_tpu.core.sweep import GBPConfig
    from gbp_tpu.models import ba

    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    ell_fused = False if args.unfused else None
    out = {"platform": str(jax.devices()[0]), "scenes": {}}

    if not args.skip_bench_scene:
        sim = ba.simulate(n_cams=64, n_lmks=8000, pix_sigma=1.0, seed=0)
        graph, means = ba.build(sim)
        r = profile_scene(graph, means, cfg, window=False, iters=args.iters,
                          ell_fused=ell_fused)
        out["scenes"]["bench64"] = r
        print(f"[profile] bench64: {json.dumps(r)}", flush=True)

    sim = ba.simulate_blocks(n_blocks=args.blocks, n_cams=args.cams,
                             lmks_per_cam=args.lpc, window=3, seed=0,
                             shuffle=True)
    n_cams_total = sim["cam_init"].shape[0]
    graph, means = ba.build(sim, layout="ell", cam_prior_prec=1000.0,
                            lmk_prior_prec=1000.0)
    for window in (False, True):
        r = profile_scene(graph, means, cfg, window=window, iters=args.iters,
                          ell_fused=ell_fused)
        key = f"blocks{n_cams_total}_" + ("win" if window else "full")
        out["scenes"][key] = r
        print(f"[profile] {key}: {json.dumps(r)}", flush=True)

    path = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "artifacts", "window_profile_tpu_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[profile] wrote {path}")


if __name__ == "__main__":
    main()
