#!/usr/bin/env python
"""End-to-end SfM with no oracle input: pixels -> tracks -> pose bootstrap
-> GBP bundle adjustment.

Renders synthetic frames (no imagery ships with the repo), tracks features
(Harris + ZNCC), bootstraps every camera pose and landmark from the 2D
tracks alone (essential matrix + incremental PnP), and refines with GBP.

    python examples/sfm_from_pixels.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.frontend import init_pose, pipeline
from gbp_tpu.models import ba


def main():
    shape = (240, 320)
    k = np.array([260.0, 260.0, shape[1] / 2, shape[0] / 2])
    scene = ba.simulate(n_cams=6, n_lmks=120, seed=3, fov_frac=0.25,
                        k=tuple(k))
    print("rendering frames...")
    frames = pipeline.render_scene(scene["cam_truth"], scene["lmk_truth"], k,
                                   shape=shape, seed=3)

    print("tracking...")
    cam_ids, lmk_ids, obs = pipeline.build_tracks(
        list(np.asarray(frames)), max_corners=256, min_score=0.9, ratio=0.85,
        min_track_len=3, max_disp=25.0)
    print(f"  {obs.shape[0]} observations across {int(lmk_ids.max()) + 1} tracks")

    print("bootstrapping poses (essential + PnP)...")
    cams, lmks, cam_ok, lmk_ok = init_pose.initialize_poses(
        k, cam_ids, lmk_ids, obs, len(frames))
    print(f"  registered {cam_ok.sum()}/{len(frames)} cameras, "
          f"{lmk_ok.sum()} landmarks")

    sel = lmk_ok[lmk_ids]
    remap = -np.ones(lmk_ok.size, dtype=np.int64)
    remap[lmk_ok] = np.arange(int(lmk_ok.sum()))
    boot = dict(cam_init=cams, lmk_init=lmks[lmk_ok], obs=obs[sel],
                cam_ids=cam_ids[sel], lmk_ids=remap[lmk_ids[sel]],
                k=k, pix_sigma=1.0)
    graph, means = ba.build(boot, huber=2.0)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)

    print("refining with GBP...")
    state = jax.jit(run, static_argnums=3)(graph, init_state(graph, means),
                                           cfg, 60)
    are = float(ba.avg_reprojection_error(graph, state, k=k))
    print(f"final avg reprojection error: {are:.3f} px")


if __name__ == "__main__":
    main()
