#!/usr/bin/env python
"""Bundle-adjustment driver (reference parity: joeaortiz/gbp `ba.py`, SURVEY.md C13).

Loads a BAL file (or simulates a scene), runs synchronous GBP sweeps with the
reference's prior-weakening schedule, and prints per-sweep average
reprojection error.

    python ba.py --bal_file data/fr1desk_sim.txt --n_iters 100
    python ba.py --n_cams 16 --n_lmks 400 --n_iters 100   # synthetic scene
"""
import argparse
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bal_file", "--file", default=None,
                   help="BAL-format problem file (optionally .gz)")
    p.add_argument("--n_iters", type=int, default=100, help="GBP sweeps")
    # The ~7-knob tuning surface of the method (SURVEY.md §5 'Config').
    p.add_argument("--eta_damping", type=float, default=0.4)
    p.add_argument("--lam_damping", type=float, default=0.0)
    p.add_argument("--beta", type=float, default=0.01,
                   help="relinearization threshold on belief-mean motion")
    p.add_argument("--num_undamped_iters", type=int, default=6)
    p.add_argument("--min_linear_iters", type=int, default=8)
    p.add_argument("--huber", type=float, default=None,
                   help="Huber Mahalanobis threshold in std-devs (None = off)")
    p.add_argument("--pix_sigma", type=float, default=1.0)
    # Prior schedule (arXiv:2003.03134 §4 'prior scheduling').
    p.add_argument("--weaken_every", type=int, default=10,
                   help="weaken non-anchor priors every N sweeps")
    p.add_argument("--weaken_factor", type=float, default=0.1)
    p.add_argument("--weaken_times", type=int, default=3)
    # Synthetic scene (used when no --bal_file).
    p.add_argument("--n_cams", type=int, default=16)
    p.add_argument("--n_lmks", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--oracle", action="store_true",
                   help="also print the dense-MAP reprojection error")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from gbp_tpu.core.sweep import GBPConfig, init_state, run
    from gbp_tpu.models import ba

    cfg = GBPConfig(
        eta_damping=args.eta_damping, lam_damping=args.lam_damping,
        beta=args.beta, num_undamped_iters=args.num_undamped_iters,
        min_linear_iters=args.min_linear_iters,
    )

    px_scale, k = None, None
    if args.bal_file:
        from gbp_tpu.io import bal as balio

        problem = balio.prune(balio.read_bal(args.bal_file))
        sim = balio.to_sim(problem, pix_sigma=args.pix_sigma)
        graph, means, px_scale = ba.build_bal(sim, huber=args.huber)
        print(f"loaded {args.bal_file}: {sim['cam_init'].shape[0]} cams, "
              f"{sim['lmk_init'].shape[0]} landmarks, {sim['obs'].shape[0]} observations")
    else:
        sim = ba.simulate(n_cams=args.n_cams, n_lmks=args.n_lmks,
                          pix_sigma=args.pix_sigma, seed=args.seed)
        graph, means = ba.build(sim, huber=args.huber)
        k = sim["k"]
        print(f"simulated scene: {args.n_cams} cams, {sim['lmk_init'].shape[0]} "
              f"landmarks, {sim['obs'].shape[0]} observations")
    print(f"device: {jax.devices()[0]}")

    state = init_state(graph, means)
    runj = jax.jit(run, static_argnums=3)
    are = float(ba.avg_reprojection_error(graph, state, k=k, px_scale=px_scale))
    print(f"sweep   0: avg reprojection error {are:9.4f} px")

    t0 = time.time()
    weakened = 0
    for it in range(0, args.n_iters, args.weaken_every):
        n = min(args.weaken_every, args.n_iters - it)
        state = runj(graph, state, cfg, n)
        are = float(ba.avg_reprojection_error(graph, state, k=k, px_scale=px_scale))
        print(f"sweep {it + n:3d}: avg reprojection error {are:9.4f} px")
        if weakened < args.weaken_times:
            graph = ba.weaken_priors(graph, args.weaken_factor)
            weakened += 1
    dt = time.time() - t0
    print(f"{args.n_iters} sweeps in {dt:.2f}s  ({args.n_iters / dt:.1f} sweeps/s)")

    if args.oracle:
        from gbp_tpu.core import oracle

        mu = oracle.map_solution(graph, state)
        ref = ba.with_means(state, mu)
        are_map = float(ba.avg_reprojection_error(graph, ref, k=k, px_scale=px_scale))
        print(f"dense-MAP avg reprojection error {are_map:9.4f} px")


if __name__ == "__main__":
    main()
