"""Large-problem single-chip throughput: city-scale BA + a long pose graph.

Round-4 rework (VERDICT r3 item 1a): the original harness built a single
1792-camera corridor CHAIN with plain un-annealed sweeps — a scene the
perf ledger itself documents as beyond the annealed-GBP recipe (NaNs in
every engine path; docs/PERFORMANCE.md "Long single chains") — and then
asserted finiteness.  The large-camera workload is now the f32-STABLE
merged-corridor-blocks city scene (`models/ba.simulate_blocks`, shuffled
landmark ids so the windowed table path must engage via the locality
sort — real-BAL-file conditions), measured with the camera-window kernels
ON vs OFF, plus a loop-closure-rich Manhattan pose graph on the CM fast
path (loop-rich graphs have bounded effective diameter, unlike chains).

Run ON CHIP (the axon tunnel is single-client; nothing else may hold the
device):

    python -m gbp_tpu.bench.bigscene [--blocks 32] [--cams 40] [--lpc 60]
        [--sweeps 50] [--poses 4000]

Writes gbp_tpu/bench/artifacts/bigscene_tpu_r4.json.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def _measure_cm(graph, means, cfg, sweeps, window):
    import jax

    from gbp_tpu.core import sweep_cm

    cmg = sweep_cm.prepare(graph, segsum_exact=True, window=window)
    assert cmg is not None, "scene must be CM-eligible"
    state = sweep_cm.init_state(cmg, means)
    runj = jax.jit(sweep_cm.run, static_argnums=3)
    state = runj(cmg, state, cfg, sweeps)
    state.v[0].mean.block_until_ready()  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = runj(cmg, state, cfg, sweeps)
        out.v[0].mean.block_until_ready()
        ts.append(time.time() - t0)
    state = out
    dt = sorted(ts)[1]
    win_w = int(cmg.win_w) or None  # 0 = windows disabled (full table)
    return sweeps / dt, state, cmg, win_w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=32,
                    help="independent corridor blocks (f32-stable city scene)")
    ap.add_argument("--cams", type=int, default=40, help="cameras per block")
    ap.add_argument("--lpc", type=int, default=60,
                    help="landmarks per camera within a block")
    ap.add_argument("--sweeps", type=int, default=50)
    ap.add_argument("--poses", type=int, default=4000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from gbp_tpu.core import sweep_cm
    from gbp_tpu.core.sweep import GBPConfig
    from gbp_tpu.models import ba, pose_graph

    dev = jax.devices()[0]
    out = {"platform": str(dev), "results": {}}

    # --- city-scale merged-blocks BA (shuffled ids -> locality sort) ---
    sim = ba.simulate_blocks(n_blocks=args.blocks, n_cams=args.cams,
                             lmks_per_cam=args.lpc, window=3, seed=0,
                             shuffle=True)
    n_cams_total = sim["cam_init"].shape[0]
    graph, means = ba.build(sim, layout="ell", cam_prior_prec=1000.0,
                            lmk_prior_prec=1000.0)
    fb0 = graph.fblocks[0]
    m = fb0.count if fb0.n_valid is None else fb0.n_valid
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    print(f"[bigscene] city blocks: {n_cams_total} cams "
          f"({args.blocks}x{args.cams}), {sim['lmk_init'].shape[0]} lmks, "
          f"{m} factors on {dev}")
    for window in (False, True):
        sps, state, cmg, win_w = _measure_cm(graph, means, cfg, args.sweeps,
                                             window)
        are = float(ba.avg_reprojection_error(
            graph, sweep_cm.to_gbp_state(cmg, state), k=sim["k"]))
        assert np.isfinite(are), "non-finite ARE"
        tag = "window" if window else "full_table"
        out["results"][f"ba_{tag}"] = {
            "n_cams": int(n_cams_total),
            "n_factors": int(m), "sweeps_per_s": round(sps, 2),
            "factor_updates_per_s": round(sps * m),
            "are_px": round(are, 4), "win_w": win_w,
        }
        print(f"[bigscene] BA {tag}: {sps:.2f} sweeps/s "
              f"({sps * m / 1e6:.0f}M factor-updates/s), ARE {are:.3f}px"
              + (f", win_w={win_w}" if win_w else ""))

    # --- long Manhattan pose graph on the CM fast path ---
    psim = pose_graph.simulate_manhattan(n_poses=args.poses, seed=0,
                                         loop_prob=0.3, loop_radius=3.0)
    pg, pmeans = pose_graph.build(psim, layout="ell")
    pcfg = pose_graph.default_config()
    pfb = pg.fblocks[0]
    pm = pfb.count if pfb.n_valid is None else pfb.n_valid
    sps, state, cmg, win_w = _measure_cm(pg, pmeans, pcfg, args.sweeps, True)
    est = np.asarray(sweep_cm.to_gbp_state(cmg, state).v[0].mean)
    ate = float(pose_graph.ate(est, psim["truth"]))
    assert np.isfinite(ate), "non-finite ATE"
    out["results"]["pose_graph_cm"] = {
        "n_poses": args.poses, "n_factors": int(pm),
        "sweeps_per_s": round(sps, 2),
        "factor_updates_per_s": round(sps * pm),
        "ate": round(ate, 4), "win_w": win_w,
    }
    print(f"[bigscene] pose graph ({args.poses} poses, {pm} factors): "
          f"{sps:.2f} sweeps/s, ATE {ate:.3f}"
          + (f", win_w={win_w}" if win_w else ""))

    path = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "artifacts", "bigscene_tpu_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[bigscene] wrote {path}")


if __name__ == "__main__":
    main()
