"""Driver-script smoke tests: ba.py / slam.py run end-to-end as a user would
invoke them (subprocesses on the CPU backend), across the path-selection
logic (CM fast path, generic forms, multi-chip halo)."""
import os
import subprocess
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, devices=1):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    # The env var alone cannot override a preset TPU platform; force CPU via
    # jax.config before the driver's backend initializes.
    boot = (
        "import sys, runpy, jax; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = [{script!r}] + sys.argv[1:]; "
        f"runpy.run_path({os.path.join(_ROOT, script)!r}, run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", boot, *args],
        capture_output=True, text=True, timeout=420, env=env, cwd=_ROOT)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out.stdout


def _final_are(stdout):
    last = [l for l in stdout.splitlines() if "reprojection error" in l][-1]
    return float(last.split()[-2])


def test_ba_cli_cm_fast_path():
    out = _run("ba.py", "--n_cams", "6", "--n_lmks", "50", "--n_iters", "20")
    assert "persistent component-major" in out
    assert np.isfinite(_final_are(out))


def test_ba_cli_covariance_form():
    out = _run("ba.py", "--n_cams", "5", "--n_lmks", "40", "--n_iters", "10",
               "--message_form", "covariance", "--oracle")
    assert "generic sweep (covariance)" in out
    assert "dense-MAP" in out


def test_ba_cli_multichip_halo():
    out = _run("ba.py", "--n_cams", "8", "--n_lmks", "60", "--n_iters", "20",
               "--n_chips", "2", devices=2)
    assert "halo" in out
    assert np.isfinite(_final_are(out))


def test_ba_cli_bal_file():
    out = _run("ba.py", "--bal_file", "data/toy_ba.txt", "--n_iters", "20")
    assert _final_are(out) < 3.0


def test_ba_cli_optimize_intrinsics():
    out = _run("ba.py", "--bal_file", "data/toy_ba.txt", "--n_iters", "20",
               "--optimize_intrinsics")
    assert "9-dof cameras" in out
    assert np.isfinite(_final_are(out))


def test_slam_cli():
    out = _run("slam.py", "--n_poses", "40", "--n_iters", "30",
               "--print_every", "30")
    assert "energy" in out


def test_slam_cli_multichip_halo_cm():
    """Synthetic world over 4 devices: the merged pose-graph block takes the
    per-chip CM fast path under the halo exchange."""
    out = _run("slam.py", "--n_poses", "80", "--n_iters", "30",
               "--print_every", "30", "--n_chips", "4", devices=4)
    assert "halo_cm" in out
    last = [l for l in out.splitlines() if "ATE" in l][-1]
    assert np.isfinite(float(last.split()[-1]))


def test_slam_cli_g2o_file_multichip():
    out = _run("slam.py", "--g2o_file", "data/manhattan_sim.g2o",
               "--n_iters", "20", "--print_every", "20", "--n_chips", "2",
               devices=2)
    assert "halo (owner-sharded) on 2 devices" in out
