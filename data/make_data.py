#!/usr/bin/env python
"""Generate the bundled example datasets (SURVEY.md C14).

The reference ships a small BAL-format problem in data/; with no network we
generate equivalents from the synthetic simulators and commit the files:

  ladybug49_sim.txt  BAL-format BA problem at Ladybug-49 scale (configs[2]):
                     49 cameras, ~2.4k landmarks, BAL camera convention
                     (z-negation + radial distortion).
  toy_ba.txt         Tiny BAL problem for fast tests / smoke runs.
  manhattan_sim.g2o  SE(2) pose graph, 500 poses (configs[1]).

Run from the repo root:  python data/make_data.py
"""
import os

import numpy as np

from gbp_tpu.io.bal import write_bal
from gbp_tpu.io.g2o import write_g2o_se2
from gbp_tpu.models import ba, pose_graph
from gbp_tpu.utils.lie import so3_exp

HERE = os.path.dirname(os.path.abspath(__file__))


def make_bal(path, n_cams, n_lmks, f=500.0, k1=-0.05, k2=0.01, pix_sigma=1.0, seed=3):
    """BAL file from the synthetic arc scene: truth-generated observations in
    the BAL convention, noisy-initial cameras/points as the stored estimate."""
    import jax.numpy as jnp

    sim = ba.simulate(n_cams=n_cams, n_lmks=n_lmks, pix_sigma=pix_sigma, seed=seed)
    rng = np.random.default_rng(seed + 1)
    cam_t, lmk_t = sim["cam_truth"], sim["lmk_truth"]
    cam_ids, lmk_ids = sim["cam_ids"], sim["lmk_ids"]

    # Re-project with the BAL model: p = -Xc.xy / Xc.z, pix = f (1 + k1 r^2 + k2 r^4) p.
    obs = np.empty((cam_ids.size, 2))
    for c in np.unique(cam_ids):
        sel = cam_ids == c
        r = np.asarray(so3_exp(jnp.asarray(cam_t[c, :3])))
        xc = lmk_t[lmk_ids[sel]] @ r.T + cam_t[c, 3:]
        p = -xc[:, :2] / xc[:, 2:3]
        r2 = np.sum(p * p, axis=1, keepdims=True)
        obs[sel] = f * (1.0 + k1 * r2 + k2 * r2 * r2) * p
    obs += pix_sigma * rng.standard_normal(obs.shape)

    cam_params = np.concatenate(
        [sim["cam_init"], np.tile([f, k1, k2], (n_cams, 1))], axis=1
    )
    write_bal(path, cam_params, sim["lmk_init"], obs, cam_ids, lmk_ids)
    print(f"wrote {path}: {n_cams} cams, {sim['lmk_init'].shape[0]} points, "
          f"{obs.shape[0]} observations")


def make_corridor_bal(path, n_cams=64, lmks_per_cam=30, window=3,
                      f=500.0, pix_sigma=1.0, seed=7):
    """BAL file from the corridor/street scene (visibility locality — the
    city-scale partitioning regime; see ba.simulate_corridor).  Solve with
    the prior-annealing schedule: ba.py handles it, but chain-structured BA
    diverges without strong initial priors (docs/PERFORMANCE.md)."""
    sim = ba.simulate_corridor(n_cams=n_cams, lmks_per_cam=lmks_per_cam,
                               window=window, pix_sigma=pix_sigma, seed=seed,
                               k=(f, f, 320.0, 240.0))
    # BAL convention: p = -Xc.xy / Xc.z, pix = f * p (no distortion).
    import jax.numpy as jnp

    cam_t, lmk_t = sim["cam_truth"], sim["lmk_truth"]
    cam_ids, lmk_ids = sim["cam_ids"], sim["lmk_ids"]
    rng = np.random.default_rng(seed + 1)
    obs = np.empty((cam_ids.size, 2))
    for c in np.unique(cam_ids):
        sel = cam_ids == c
        r = np.asarray(so3_exp(jnp.asarray(cam_t[c, :3])))
        xc = lmk_t[lmk_ids[sel]] @ r.T + cam_t[c, 3:]
        obs[sel] = -f * xc[:, :2] / xc[:, 2:3]
    obs += pix_sigma * rng.standard_normal(obs.shape)
    cam_params = np.concatenate(
        [sim["cam_init"], np.tile([f, 0.0, 0.0], (n_cams, 1))], axis=1)
    write_bal(path, cam_params, sim["lmk_init"], obs, cam_ids, lmk_ids)
    print(f"wrote {path}: {n_cams} cams, {sim['lmk_init'].shape[0]} points, "
          f"{obs.shape[0]} observations (corridor)")


def make_g2o(path, n_poses, seed=5):
    sim = pose_graph.simulate_manhattan(n_poses=n_poses, seed=seed)
    ij = np.concatenate([sim["odom_ij"], sim["loop_ij"]], axis=0)
    z = np.concatenate([sim["odom_z"], sim["loop_z"]], axis=0)
    sig = np.concatenate(
        [np.tile(sim["odom_sigma"], (sim["odom_ij"].shape[0], 1)),
         np.tile(sim["loop_sigma"], (sim["loop_ij"].shape[0], 1))], axis=0)
    info = np.zeros((ij.shape[0], 3, 3))
    info[:, np.arange(3), np.arange(3)] = 1.0 / (sig * sig)
    write_g2o_se2(path, sim["init"], ij, z, info)
    print(f"wrote {path}: {n_poses} poses, {ij.shape[0]} edges")


if __name__ == "__main__":
    make_bal(os.path.join(HERE, "ladybug49_sim.txt.gz"), n_cams=49, n_lmks=2400)
    make_bal(os.path.join(HERE, "toy_ba.txt"), n_cams=6, n_lmks=80, seed=11)
    make_g2o(os.path.join(HERE, "manhattan_sim.g2o"), n_poses=500)
    make_corridor_bal(os.path.join(HERE, "corridor_sim.txt.gz"))
