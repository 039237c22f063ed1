"""Worker process for tests/test_multihost.py.

Run as:  python tests/_multihost_worker.py <process_id> <num_processes> \
             <devices_per_process> <port> <out_json> [path]

path: "halo" (default, generic sweep) or "halo_cm" (per-chip CM fast path,
interpret-mode kernels on CPU).

Each worker simulates one "host" with K virtual CPU devices, joins the
jax.distributed cluster, runs the halo-sharded BA sweep over the global
mesh, and (process 0) writes the collected global means to out_json.
"""
import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    k = int(sys.argv[3])
    port = sys.argv[4]
    out_json = sys.argv[5]
    path = sys.argv[6] if len(sys.argv) > 6 else "halo"

    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={k}"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from gbp_tpu.core.sweep import GBPConfig
    from gbp_tpu.models import ba
    from gbp_tpu.parallel import halo, halo_cm, multihost

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert len(jax.devices()) == nproc * k
    mesh = multihost.global_mesh()

    sim = ba.simulate_corridor(n_cams=24, lmks_per_cam=12, window=2, seed=2)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none",
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas" if path == "halo_cm" else "covariance")
    if path == "halo_cm":
        out = halo_cm.distribute(graph, means, mesh)
        assert out is not None
        hp, hcm, st, run_fn = out
        st = run_fn(hcm, st, cfg, 15)
    else:
        hp, st, run_fn = halo.distribute(graph, means, mesh)
        st = run_fn(hp.hgraph, st, cfg, 15)
    got = multihost.collect_means(hp, st)
    if multihost.is_primary():
        with open(out_json, "w") as f:
            json.dump({"means": [g.tolist() for g in got],
                       "n_devices": len(jax.devices()),
                       "n_processes": jax.process_count()}, f)
    jax.effects_barrier()


if __name__ == "__main__":
    main()
