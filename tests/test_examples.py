"""Smoke tests for the shipped examples (VERDICT r3 item 6): both scripts
run end-to-end as a user would invoke them — `python examples/<name>.py` —
in a CPU subprocess, and their final quality lines are finite/sane.
`examples/online_slam.py` is the public face of the fixed-lag eviction work
(models/online.py); `examples/sfm_from_pixels.py` exercises the whole
frontend (render -> track -> bootstrap -> GBP refine)."""
import os
import subprocess
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # The env var alone cannot override a preset TPU platform; force CPU via
    # jax.config before the example's backend initializes (test_cli.py
    # pattern).
    path = os.path.join(_ROOT, "examples", script)
    boot = (
        "import sys, runpy, jax; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = [{path!r}]; "
        f"runpy.run_path({path!r}, run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", boot], capture_output=True,
                         text=True, timeout=420, env=env, cwd=_ROOT)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out.stdout


def test_online_slam_example():
    out = _run("online_slam.py")
    # Part 1 (growing graph) final quality line.
    batch = [l for l in out.splitlines()
             if l.startswith("final avg reprojection error")]
    assert batch and float(batch[-1].split()[4]) < 3.0, out[-2000:]
    # Part 2 (fixed-lag eviction) streams past capacity: evictions happened
    # and every per-frame ARE stayed finite and bounded.
    assert "evicted" in out
    ares = [float(l.split("ARE")[1].split()[0]) for l in out.splitlines()
            if "ARE" in l]
    assert ares and np.isfinite(ares).all() and max(ares) < 10.0, ares


def test_sfm_from_pixels_example():
    out = _run("sfm_from_pixels.py")
    last = [l for l in out.splitlines()
            if l.startswith("final avg reprojection error")]
    assert last, out[-2000:]
    # No-oracle pixels->BA pipeline: sub-2px refined reprojection error.
    assert float(last[-1].split()[4]) < 2.0, last
