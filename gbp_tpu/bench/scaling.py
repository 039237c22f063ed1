"""Weak-scaling harness: sweeps/s as the graph and mesh grow together.

North-star target [BASELINE.json]: >= 80% weak-scaling efficiency on
sweeps/s from 1 chip to a multi-host slice.  This machine exposes ONE real
TPU chip, so the harness runs on virtual CPU devices by default — the
numbers then measure partitioning/collective overhead on shared silicon,
not ICI scaling, but the same entry point runs unchanged on a pod slice.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python -m gbp_tpu.bench.scaling --chips 1 2 4 8
"""
from __future__ import annotations

import argparse
import json
import time


def measure(n_chips: int, cams_per_chip: int, n_lmks: int, sweeps: int):
    """Observations scale ~ n_cams x visibility, so holding the landmark
    cloud fixed and growing cameras with the mesh keeps factors/chip
    constant — the weak-scaling setting."""
    import jax
    from gbp_tpu.core.sweep import GBPConfig
    from gbp_tpu.models import ba
    from gbp_tpu.parallel import sharding, spmd

    sim = ba.simulate(n_cams=n_chips * cams_per_chip, n_lmks=n_lmks, seed=0)
    graph, means = ba.build(sim)
    mesh = sharding.make_mesh(n_chips)
    g_sh, s_sh = spmd.distribute(graph, means, mesh)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    run_spmd = spmd.make_run(mesh, g_sh, s_sh)

    out = run_spmd(g_sh, s_sh, cfg, sweeps)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run_spmd(g_sh, s_sh, cfg, sweeps)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    m = graph.fblocks[0].count
    return sweeps / dt, m


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chips", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--cams_per_chip", type=int, default=8)
    p.add_argument("--n_lmks", type=int, default=2000)
    p.add_argument("--sweeps", type=int, default=30)
    args = p.parse_args()

    import jax

    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")
    results = []
    base = None
    for n in args.chips:
        if n > len(jax.devices()):
            print(f"skip {n} chips (have {len(jax.devices())})")
            continue
        sps, m = measure(n, args.cams_per_chip, args.n_lmks, args.sweeps)
        if base is None:
            base = sps
        eff = sps / base
        results.append(dict(chips=n, factors=m, sweeps_per_s=round(sps, 2),
                            weak_scaling_efficiency=round(eff, 3)))
        print(f"{n} chips: {m} factors, {sps:.2f} sweeps/s, efficiency {eff:.2f}")
    print(json.dumps({"metric": "weak_scaling", "results": results}))


if __name__ == "__main__":
    main()
