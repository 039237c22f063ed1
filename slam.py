#!/usr/bin/env python
"""Pose-graph SLAM driver: g2o files or synthetic Manhattan worlds.

    python slam.py --g2o_file data/manhattan_sim.g2o --n_iters 200
    python slam.py --n_poses 500 --n_iters 200          # synthetic world
"""
import argparse
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--g2o_file", default=None, help="g2o pose-graph file (SE2 or SE3)")
    p.add_argument("--n_iters", type=int, default=200)
    p.add_argument("--huber", type=float, default=2.0)
    p.add_argument("--n_poses", type=int, default=500)
    p.add_argument("--se3", action="store_true",
                   help="synthetic 3D helical world (SE(3) pose graph) "
                        "instead of the 2D Manhattan world")
    p.add_argument("--outlier_frac", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print_every", type=int, default=20)
    p.add_argument("--n_chips", type=int, default=1,
                   help="partition the pose graph over the first N devices "
                        "(owner-sharded halo SPMD, gbp_tpu.parallel.halo)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from gbp_tpu.core.sweep import energy, init_state, run
    from gbp_tpu.models import pose_graph

    cfg = pose_graph.default_config()
    truth = None
    if args.g2o_file:
        from gbp_tpu.io import g2o as g2oio

        data = g2oio.read_g2o(args.g2o_file)
        graph, means = pose_graph.build_g2o(
            data, huber=args.huber,
            layout="ell" if args.n_chips == 1 else "none")
        print(f"loaded {args.g2o_file} ({data['kind']}): "
              f"{data['poses'].shape[0]} poses, {data['edges_ij'].shape[0]} edges")
    elif args.se3:
        data = pose_graph.simulate_helix(n_poses=args.n_poses, seed=args.seed)
        graph, means = pose_graph.build_g2o(
            data, huber=args.huber,
            layout="ell" if args.n_chips == 1 else "none")
        truth = data["truth"]
        print(f"simulated SE(3) helix: {args.n_poses} poses, "
              f"{data['edges_ij'].shape[0]} edges")
    else:
        sim = pose_graph.simulate_manhattan(
            n_poses=args.n_poses, outlier_frac=args.outlier_frac, seed=args.seed)
        # Single-chip: ELL layout so the component-major fast path can
        # engage (core/sweep_cm.py — same-block between factors, per-factor
        # huber); halo partitions the plain layout.
        graph, means = pose_graph.build(
            sim, huber=args.huber,
            layout="ell" if args.n_chips == 1 else "none")
        truth = sim["truth"]
        print(f"simulated Manhattan world: {args.n_poses} poses, "
              f"{sim['odom_ij'].shape[0]} odometry + {sim['loop_ij'].shape[0]} loop factors")
    hp = run_halo = mesh = cmg = hcm = None
    if args.n_chips > 1:
        import numpy as np
        from jax.sharding import Mesh

        from gbp_tpu.parallel import halo

        devs = jax.devices()
        assert len(devs) >= args.n_chips, \
            f"--n_chips {args.n_chips} but only {len(devs)} devices"
        mesh = Mesh(np.asarray(devs[: args.n_chips]).reshape(-1), ("graph",))
        from gbp_tpu.parallel import halo_cm

        out = halo_cm.distribute(graph, means, mesh)
        if out is not None:
            hp, hcm, state, run_halo = out
            print(f"path: halo_cm (owner-sharded, per-chip CM fast path) "
                  f"on {args.n_chips} devices")
        else:
            hp, state, run_halo = halo.distribute(graph, means, mesh)
            print(f"path: halo (owner-sharded) on {args.n_chips} devices")
    else:
        from gbp_tpu.core import sweep_cm

        cmg = sweep_cm.prepare(graph)
        if cmg is not None:
            state = sweep_cm.init_state(cmg, means)
            win = f", pose-window w={cmg.win_w}" if cmg.win_w else ""
            print(f"path: cm (persistent component-major{win})")
        else:
            state = init_state(graph, means)
            print("path: generic sweep")
        print(f"device: {jax.devices()[0]}")

    # Means-only template for halo-path metrics (built once).
    metric_state = init_state(graph, means) if hp is not None else None

    runj = jax.jit(run, static_argnums=3)
    t0 = time.time()
    for it in range(0, args.n_iters, args.print_every):
        n = min(args.print_every, args.n_iters - it)
        if hp is not None:
            from gbp_tpu.parallel import halo

            state = run_halo(hcm if hcm is not None else hp.hgraph,
                             state, cfg, n)
            mu = halo.collect_means(hp, state)[0]
            if hcm is not None:
                # HaloCMState keeps factor state in kernel layout; evaluate
                # energy at the collected means on the single-graph template.
                mv = list(metric_state.v)
                mv[0] = mv[0].replace(mean=jax.numpy.asarray(mu))
                e = energy(graph, metric_state.replace(v=tuple(mv)))
            else:
                e = halo.energy_halo(hp, state, mesh)
            line = f"sweep {it + n:4d}: energy {float(e):12.3f}"
            if truth is not None:
                line += f"  ATE {pose_graph.ate(mu, truth):8.4f}"
        elif cmg is not None:
            from gbp_tpu.core import sweep_cm

            state = jax.jit(sweep_cm.run, static_argnums=3)(cmg, state, cfg, n)
            gbp = sweep_cm.to_gbp_state(cmg, state)
            e = float(energy(graph, gbp))
            line = f"sweep {it + n:4d}: energy {e:12.3f}"
            if truth is not None:
                line += f"  ATE {pose_graph.ate(state.v[0].mean, truth):8.4f}"
        else:
            state = runj(graph, state, cfg, n)
            e = float(energy(graph, state))
            line = f"sweep {it + n:4d}: energy {e:12.3f}"
            if truth is not None:
                line += f"  ATE {pose_graph.ate(state.v[0].mean, truth):8.4f}"
        print(line)
    dt = time.time() - t0
    print(f"{args.n_iters} sweeps in {dt:.2f}s  ({args.n_iters / dt:.1f} sweeps/s)")


if __name__ == "__main__":
    main()
