"""Per-chip rate under partitioning: halo_cm on a 1-chip mesh vs plain CM.

The cost of the partitioned execution machinery itself — shard_map, the
per-chip ELL regroup, the (here trivial) halo exchange — measured on ONE
real chip at the headline bench size, so the multi-chip path's per-chip
throughput can be honestly compared to the single-chip fast path
(docs/DISTRIBUTED.md "Per-chip rate under partitioning"; VERDICT r3
item 8: the committed r2 artifact predated same-block pose support and
the camera-window kernels).

Run ON CHIP:  python -m gbp_tpu.bench.per_chip_rate [--sweeps 100]

Writes gbp_tpu/bench/artifacts/per_chip_rate_tpu_r4.json.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def _timed(run_fn, args, sweeps):
    import jax

    out = run_fn(*args, sweeps)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_fn(*args, sweeps)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sweeps / sorted(ts)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_cams", type=int, default=64)
    ap.add_argument("--n_lmks", type=int, default=8000)
    ap.add_argument("--sweeps", type=int, default=100)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import functools

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from gbp_tpu.core import sweep_cm
    from gbp_tpu.core.sweep import GBPConfig
    from gbp_tpu.models import ba, pose_graph
    from gbp_tpu.parallel import halo_cm

    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("graph",))
    out = {"metric": "per_chip_rate_under_partitioning",
           "platform": str(jax.devices()[0]), "results": {}}

    # BA at the headline bench size.
    sim = ba.simulate(n_cams=args.n_cams, n_lmks=args.n_lmks, pix_sigma=1.0,
                      seed=0)
    graph, means = ba.build(sim)
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    m = graph.fblocks[0].n_valid or graph.fblocks[0].count
    sps_plain = _timed(
        functools.partial(jax.jit(sweep_cm.run, static_argnums=3), cmg,
                          sweep_cm.init_state(cmg, means), cfg),
        (), args.sweeps)
    g_none, m_none = ba.build(sim, layout="none")
    hp, hcm, st, run_fn = halo_cm.distribute(g_none, m_none, mesh)
    sps_halo = _timed(functools.partial(run_fn, hcm, st, cfg), (),
                      args.sweeps)
    out["results"]["ba"] = {
        "n_factors": int(m),
        "plain_cm_sweeps_per_s": round(sps_plain, 1),
        "halo_cm_1chip_sweeps_per_s": round(sps_halo, 1),
        "ratio": round(sps_halo / sps_plain, 3),
    }
    print(f"[per_chip_rate] BA {m} factors: plain {sps_plain:.1f}, "
          f"halo_cm(1) {sps_halo:.1f} sweeps/s "
          f"({sps_halo / sps_plain:.1%})", flush=True)

    # Same-block pose graph (the round-3 halo_cm path the r2 artifact
    # predated).
    psim = pose_graph.simulate_manhattan(n_poses=1500, seed=0, loop_prob=0.3,
                                         loop_radius=3.0)
    pcfg = pose_graph.default_config()
    pg_ell, pm_ell = pose_graph.build(psim, layout="ell")
    pcmg = sweep_cm.prepare(pg_ell, segsum_exact=True)
    pm = pg_ell.fblocks[0].n_valid or pg_ell.fblocks[0].count
    sps_plain_p = _timed(
        functools.partial(jax.jit(sweep_cm.run, static_argnums=3), pcmg,
                          sweep_cm.init_state(pcmg, pm_ell), pcfg),
        (), args.sweeps)
    pg, pmeans = pose_graph.build(psim)
    pout = halo_cm.distribute(pg, pmeans, mesh)
    assert pout is not None
    _, phcm, pst, prun = pout
    sps_halo_p = _timed(functools.partial(prun, phcm, pst, pcfg), (),
                        args.sweeps)
    out["results"]["pose_graph"] = {
        "n_factors": int(pm),
        "plain_cm_sweeps_per_s": round(sps_plain_p, 1),
        "halo_cm_1chip_sweeps_per_s": round(sps_halo_p, 1),
        "ratio": round(sps_halo_p / sps_plain_p, 3),
    }
    print(f"[per_chip_rate] pose graph {pm} factors: plain {sps_plain_p:.1f},"
          f" halo_cm(1) {sps_halo_p:.1f} sweeps/s "
          f"({sps_halo_p / sps_plain_p:.1%})", flush=True)

    path = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "artifacts", "per_chip_rate_tpu_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[per_chip_rate] wrote {path}")


if __name__ == "__main__":
    main()
