#!/usr/bin/env python
"""Incremental (online) bundle adjustment: keyframes stream in, the graph
grows inside fixed-capacity arrays, and nothing recompiles after the first
frame — the GBP SLAM serving loop.

    python examples/online_slam.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gbp_tpu.core.sweep import GBPConfig
from gbp_tpu.models import ba, online


def main():
    scene = ba.simulate(n_cams=10, n_lmks=200, seed=1, fov_frac=0.25)
    k = scene["k"]
    uv_n = np.stack([(scene["obs"][:, 0] - k[2]) / k[0],
                     (scene["obs"][:, 1] - k[3]) / k[1]], axis=1)

    # group observations per camera; landmarks numbered by first sighting
    remap, frames = {}, []
    for c in range(10):
        sel = np.flatnonzero(scene["cam_ids"] == c)
        new, ids = [], []
        for t in scene["lmk_ids"][sel]:
            if t not in remap:
                remap[t] = len(remap)
                new.append(scene["lmk_init"][t])
            ids.append(remap[t])
        frames.append((scene["cam_init"][c], np.asarray(ids, np.int32),
                       uv_n[sel], np.asarray(new).reshape(-1, 3)))

    chunk = 256
    pad = lambda a: np.concatenate(
        [a, np.zeros((chunk - len(a),) + a.shape[1:], a.dtype)])
    ob = online.create(cam_capacity=12, lmk_capacity=400, obs_capacity=4096,
                       chunk=chunk, pix_sigma_n=scene["pix_sigma"] / k[0])
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)

    for i, (cam, ids, uv, new) in enumerate(frames):
        prec = (np.full(6, 1e5) if i == 0
                else np.array([1.0] * 3 + [1e5] * 3) if i == 1
                else np.ones(6))
        t0 = time.time()
        ob = online.add_frame(
            ob, jnp.asarray(cam), jnp.asarray(prec),
            jnp.zeros(chunk, jnp.int32), jnp.asarray(pad(ids)),
            jnp.asarray(pad(uv)), jnp.int32(len(ids)),
            jnp.asarray(pad(new)), jnp.int32(len(new)),
            check=False)  # capacity pre-sized above; skip the sync
        ob = online.run(ob, cfg, 10)
        ob = online.weaken_landmark_priors(ob, 0.6)
        ob.state.v[0].mean.block_until_ready()
        print(f"frame {i}: {len(ids):3d} obs, {len(new):3d} new landmarks, "
              f"{(time.time() - t0) * 1e3:7.1f} ms")

    m = ob.graph.fblocks[0].count
    are = float(ba.avg_reprojection_error(
        ob.graph, ob.state, px_scale=np.full((m, 2), k[0])))
    print(f"final avg reprojection error: {are:.3f} px "
          f"({int(ob.n_cams)} cams, {int(ob.n_lmks)} landmarks, "
          f"{int(ob.n_obs)} observations)")


if __name__ == "__main__":
    main()
