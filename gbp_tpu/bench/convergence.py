"""Wall-clock-to-convergence benchmark (BASELINE.json metric).

Runs GBP sweeps and the Schur/CG Gauss-Newton solver on the same BA problem
and reports time-to-ARE-threshold for both, plus the per-sweep convergence
curve (the reference's methodology: per-sweep average reprojection error,
SURVEY.md §4.3).

    python -m gbp_tpu.bench.convergence [--bal_file data/ladybug49_sim.txt.gz]
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bal_file", default=None)
    p.add_argument("--n_cams", type=int, default=32)
    p.add_argument("--n_lmks", type=int, default=2000)
    p.add_argument("--max_sweeps", type=int, default=400)
    p.add_argument("--chunk", type=int, default=20)
    p.add_argument("--tol_px", type=float, default=0.02,
                   help="converged when ARE is within tol of the GN optimum")
    args = p.parse_args()

    import jax
    from gbp_tpu.core.sweep import GBPConfig, init_state, run
    from gbp_tpu.models import ba
    from gbp_tpu.parallel import schur

    px_scale, k = None, None
    if args.bal_file:
        from gbp_tpu.io import bal as balio

        sim = balio.to_sim(balio.prune(balio.read_bal(args.bal_file)))
        graph, means, px_scale = ba.build_bal(sim)
    else:
        sim = ba.simulate(n_cams=args.n_cams, n_lmks=args.n_lmks, seed=0)
        graph, means = ba.build(sim)
        k = sim["k"]
    m = int(graph.fblocks[0].valid.sum()) if graph.fblocks[0].valid is not None \
        else graph.fblocks[0].count
    print(f"problem: {means[0].shape[0]} cams, {means[1].shape[0]} lmks, {m} obs "
          f"on {jax.devices()[0]}")

    def are_of(state):
        return float(ba.avg_reprojection_error(graph, state, k=k, px_scale=px_scale))

    # Gauss-Newton via distributed Schur (direct solver reference point).
    state0 = init_state(graph, means)
    t0 = time.perf_counter()
    gn_means = schur.solve(graph, means, n_steps=5, cg_iters=100)
    jax.block_until_ready(gn_means)
    t_gn = time.perf_counter() - t0
    are_gn = are_of(ba.with_means(state0, gn_means))
    print(f"schur-GN: {t_gn:.2f}s (incl. compile) -> ARE {are_gn:.4f} px")

    # GBP sweeps (compile excluded: warm up one chunk first).
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    runj = jax.jit(run, static_argnums=3)
    jax.block_until_ready(runj(graph, state0, cfg, args.chunk))
    state = state0
    t0 = time.perf_counter()
    t_conv, sweeps_done = None, 0
    curve = [(0, are_of(state0))]
    for it in range(0, args.max_sweeps, args.chunk):
        state = runj(graph, state, cfg, args.chunk)
        jax.block_until_ready(state)
        sweeps_done = it + args.chunk
        are = are_of(state)
        curve.append((sweeps_done, are))
        print(f"  sweep {sweeps_done:4d}: ARE {are:.4f} px "
              f"({time.perf_counter() - t0:.2f}s)")
        if t_conv is None and are <= are_gn + args.tol_px:
            t_conv = time.perf_counter() - t0
            break
    print(json.dumps({
        "metric": "ba_wallclock_to_convergence",
        "gbp_seconds": round(t_conv if t_conv is not None else float("nan"), 3),
        "gbp_sweeps": sweeps_done,
        "gn_seconds_incl_compile": round(t_gn, 3),
        "are_gn_px": round(are_gn, 4),
        "are_gbp_px": round(curve[-1][1], 4),
    }))


if __name__ == "__main__":
    main()
