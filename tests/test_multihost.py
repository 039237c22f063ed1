"""Multi-host path (gbp_tpu/parallel/multihost.py): 2 processes x 4 virtual
CPU devices running the halo-sharded sweep over a process-spanning mesh must
reproduce the single-process 8-device result (SURVEY.md §4's "multi-process
CPU/TPU simulation"; VERDICT r1 item 2)."""
import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gbp_tpu.core.sweep import GBPConfig
from gbp_tpu.models import ba
from gbp_tpu.parallel import halo, sharding

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(out_json, port, path):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # The worker is a plain script: its sys.path gets tests/, not the repo
    # root, so `import gbp_tpu` needs the root on PYTHONPATH explicitly
    # (machine images that pre-set PYTHONPATH would otherwise shadow it).
    root = os.path.dirname(os.path.dirname(os.path.abspath(_WORKER)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    return [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", "4", str(port),
             out_json, path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]


def test_two_process_halo_matches_single_process(tmp_path):
    out_json = str(tmp_path / "mh.json")
    port = _free_port()
    procs = _launch(out_json, port, "halo")
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    with open(out_json) as f:
        res = json.load(f)
    assert res["n_devices"] == 8 and res["n_processes"] == 2

    # Single-process reference on the same 8-device (virtual) mesh.
    sim = ba.simulate_corridor(n_cams=24, lmks_per_cam=12, window=2, seed=2)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none",
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    mesh = sharding.make_mesh(8)
    hp, st, run_halo = halo.distribute(graph, means, mesh)
    st = run_halo(hp.hgraph, st, cfg, 15)
    want = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(
            np.asarray(res["means"][vbi]), want[vbi], rtol=1e-7, atol=1e-9)


def test_two_process_halo_cm_matches_single_process(tmp_path):
    """The per-chip CM fast path (Pallas kernels in interpret mode on CPU)
    under a process-spanning mesh."""
    out_json = str(tmp_path / "mhcm.json")
    port = _free_port()
    procs = _launch(out_json, port, "halo_cm")
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    with open(out_json) as f:
        res = json.load(f)

    sim = ba.simulate_corridor(n_cams=24, lmks_per_cam=12, window=2, seed=2)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none",
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    from gbp_tpu.parallel import halo_cm

    mesh = sharding.make_mesh(8)
    hp, hcm, st, run_fn = halo_cm.distribute(graph, means, mesh)
    st = run_fn(hcm, st, cfg, 15)
    want = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(
            np.asarray(res["means"][vbi]), want[vbi], rtol=1e-7, atol=1e-9)
