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
    p.add_argument("--prior_prec", type=float, default=1.0,
                   help="initial camera/landmark prior precision (before the "
                        "weakening schedule). Chain-structured scenes "
                        "(corridor_sim) need ~1000 or GBP oscillates; the "
                        "schedule anneals it back down")
    # Prior schedule (arXiv:2003.03134 §4 'prior scheduling').  The schedule
    # is compiled into the run (gbp_tpu/core/anneal.py); after each
    # weakening event, lambda damping is raised to --anneal_damp_lam for
    # --anneal_damp_window sweeps, which keeps the f32 chain-scene
    # oscillation from re-triggering (docs/PERFORMANCE.md).
    p.add_argument("--weaken_every", type=int, default=10,
                   help="weaken non-anchor priors every N sweeps")
    p.add_argument("--weaken_factor", type=float, default=0.1)
    p.add_argument("--weaken_times", type=int, default=3)
    p.add_argument("--anneal_damp_window", type=int, default=None,
                   help="sweeps of boosted lam damping after each weakening "
                        "(default: weaken_every)")
    p.add_argument("--anneal_damp_lam", type=float, default=0.4)
    # Synthetic scene (used when no --bal_file).
    p.add_argument("--n_cams", type=int, default=16)
    p.add_argument("--n_lmks", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--oracle", action="store_true",
                   help="also print the dense-MAP reprojection error")
    p.add_argument("--message_form", default="pallas",
                   choices=("pallas", "covariance", "schur"),
                   help="'pallas' uses the fused-kernel fast path (and the "
                        "persistent component-major sweep when eligible); "
                        "'schur' is the reference's info-form marginalization "
                        "— f64 only (catastrophic cancellation in f32)")
    p.add_argument("--optimize_intrinsics", action="store_true",
                   help="promote per-camera intrinsics into the state: "
                        "9-dof BAL cameras [omega, t, rf, k1, k2] (beyond "
                        "the reference's fixed per-factor intrinsics). "
                        "Requires --bal_file")
    p.add_argument("--n_chips", type=int, default=1,
                   help="partition the graph over the first N devices "
                        "(owner-sharded halo SPMD, gbp_tpu.parallel.halo)")
    p.add_argument("--dtype", default="f32", choices=("f32", "f64"),
                   help="f64 for research-grade parity runs (CPU); forced "
                        "automatically by --message_form schur")
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
        message_form=args.message_form,
    )
    layout = "none" if args.n_chips > 1 else "ell"
    import jax.numpy as jnp
    dtype = jnp.float32
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64
    if args.message_form == "schur":
        # The info-form Schur marginalization cancels catastrophically in
        # f32 (that is why the covariance form exists); force f64.
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64
        print("message_form=schur: building in f64 (f32 is numerically "
              "unsafe for the info-form marginalization)")

    px_scale, k = None, None
    if args.bal_file:
        from gbp_tpu.io import bal as balio

        problem = balio.prune(balio.read_bal(args.bal_file))
        sim = balio.to_sim(problem, pix_sigma=args.pix_sigma)
        graph, means, px_scale = ba.build_bal(
            sim, huber=args.huber, layout=layout, dtype=dtype,
            cam_prior_prec=args.prior_prec, lmk_prior_prec=args.prior_prec,
            optimize_intrinsics=args.optimize_intrinsics)
        print(f"loaded {args.bal_file}: {sim['cam_init'].shape[0]} cams, "
              f"{sim['lmk_init'].shape[0]} landmarks, {sim['obs'].shape[0]} observations"
              + (" (9-dof cameras: optimizing intrinsics)"
                 if args.optimize_intrinsics else ""))
    else:
        if args.optimize_intrinsics:
            raise SystemExit("--optimize_intrinsics requires --bal_file")
        sim = ba.simulate(n_cams=args.n_cams, n_lmks=args.n_lmks,
                          pix_sigma=args.pix_sigma, seed=args.seed)
        graph, means = ba.build(sim, huber=args.huber, layout=layout,
                                dtype=dtype, cam_prior_prec=args.prior_prec,
                                lmk_prior_prec=args.prior_prec)
        k = sim["k"]
        print(f"simulated scene: {args.n_cams} cams, {sim['lmk_init'].shape[0]} "
              f"landmarks, {sim['obs'].shape[0]} observations")

    # --- select the execution path -------------------------------------
    cmg = hp = hcm = run_halo = None
    if args.n_chips > 1:
        import numpy as np
        from jax.sharding import Mesh

        from gbp_tpu.parallel import halo, halo_cm

        devs = jax.devices()
        assert len(devs) >= args.n_chips, \
            f"--n_chips {args.n_chips} but only {len(devs)} devices"
        mesh = Mesh(np.asarray(devs[: args.n_chips]).reshape(-1), ("graph",))
        out = (halo_cm.distribute(graph, means, mesh)
               if args.message_form == "pallas" else None)
        if out is not None:
            hp, hcm, state, run_halo = out
            print(f"path: halo_cm (owner-sharded, per-chip CM fast path) "
                  f"on {args.n_chips} devices")
        else:
            hp, state, run_halo = halo.distribute(graph, means, mesh)
            hcm = None
            print(f"path: halo (owner-sharded) on {args.n_chips} devices")
    else:
        if args.message_form == "pallas":
            from gbp_tpu.core import sweep_cm

            cmg = sweep_cm.prepare(graph)
        if cmg is not None:
            state = sweep_cm.init_state(cmg, means)
            win = f", camera-window w={cmg.win_w}" if cmg.win_w else ""
            print(f"path: persistent component-major sweep "
                  f"(gather_mode={cmg.gather_mode}{win}) on {jax.devices()[0]}")
        else:
            state = init_state(graph, means)
            print(f"path: generic sweep ({args.message_form}) "
                  f"on {jax.devices()[0]}")

    # Means-only template for halo-path metrics (built ONCE: init_state
    # re-linearizes the whole factor block, far too heavy per print).
    metric_state = init_state(graph, means) if hp is not None else None

    def current_are(state):
        if hp is not None:
            from gbp_tpu.parallel import halo

            mu = halo.collect_means(hp, state)
            ref = ba.with_means(metric_state, tuple(
                jax.numpy.asarray(m) for m in mu))
            return float(ba.avg_reprojection_error(graph, ref, k=k,
                                                   px_scale=px_scale))
        if cmg is not None:
            from gbp_tpu.core import sweep_cm

            return float(ba.avg_reprojection_error(
                graph, sweep_cm.to_gbp_state(cmg, state), k=k,
                px_scale=px_scale))
        return float(ba.avg_reprojection_error(graph, state, k=k,
                                               px_scale=px_scale))

    # The full annealing schedule runs INSIDE the compiled loop
    # (gbp_tpu/core/anneal.py): per-sweep prior scaling from the loop index
    # plus the post-weakening lambda-damping window.
    from gbp_tpu.core import anneal

    damp_window = (args.weaken_every if args.anneal_damp_window is None
                   else args.anneal_damp_window)
    sched = dict(every=args.weaken_every, factor=args.weaken_factor,
                 times=args.weaken_times, damp_window=damp_window,
                 damp_lam=args.anneal_damp_lam)
    if hp is not None:
        runj = anneal.make_run_annealed_halo(mesh, hp, state)
        operand = hcm if hcm is not None else hp.hgraph
    elif cmg is not None:
        runj, operand = anneal.run_annealed_cm, cmg
    else:
        runj, operand = anneal.run_annealed, graph

    print(f"sweep   0: avg reprojection error {current_are(state):9.4f} px")

    t0 = time.time()
    for it in range(0, args.n_iters, args.weaken_every):
        n = min(args.weaken_every, args.n_iters - it)
        if hp is not None:
            state = runj(operand, state, cfg, n, sched["every"],
                         sched["factor"], sched["times"],
                         sched["damp_window"], sched["damp_lam"], it)
        else:
            state = runj(operand, state, cfg, n, i0=it, **sched)
        print(f"sweep {it + n:3d}: avg reprojection error "
              f"{current_are(state):9.4f} px")
    dt = time.time() - t0
    # Final effective priors (for the oracle print below): factor^k applied
    # to non-anchor priors, k = number of weakening events that fired.
    k_fired = min(args.weaken_times, max(0, (args.n_iters - 1) // args.weaken_every))
    if k_fired:
        graph = ba.weaken_priors(graph, args.weaken_factor ** k_fired)
    print(f"{args.n_iters} sweeps in {dt:.2f}s  ({args.n_iters / dt:.1f} sweeps/s)")

    if args.oracle:
        from gbp_tpu.core import oracle

        if hp is not None:
            from gbp_tpu.parallel import halo

            gstate = init_state(graph, tuple(
                jax.numpy.asarray(m) for m in halo.collect_means(hp, state)))
        elif cmg is not None:
            from gbp_tpu.core import sweep_cm

            gstate = sweep_cm.to_gbp_state(cmg, state)
        else:
            gstate = state
        mu = oracle.map_solution(graph, gstate)
        ref = ba.with_means(gstate, mu)
        are_map = float(ba.avg_reprojection_error(graph, ref, k=k, px_scale=px_scale))
        print(f"dense-MAP avg reprojection error {are_map:9.4f} px")


if __name__ == "__main__":
    main()
