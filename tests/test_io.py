"""IO layer: BAL/g2o round-trips and file-driven graph construction.

Reference parity: utils/read_balfile.py (SURVEY.md C11) + bundled data (C14).
"""
import os

import numpy as np
import jax.numpy as jnp

from gbp_tpu.core import oracle
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.io import bal as balio
from gbp_tpu.io import g2o as g2oio
from gbp_tpu.models import ba, pose_graph

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")


def test_bal_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    cam_params = rng.standard_normal((3, 9))
    points = rng.standard_normal((5, 3))
    obs = rng.standard_normal((7, 2))
    cam_ids = rng.integers(0, 3, 7)
    point_ids = rng.integers(0, 5, 7)
    path = tmp_path / "x.txt"
    balio.write_bal(path, cam_params, points, obs, cam_ids, point_ids)
    out = balio.read_bal(path)
    np.testing.assert_allclose(out["cam_params"], cam_params, rtol=1e-12)
    np.testing.assert_allclose(out["points"], points, rtol=1e-12)
    np.testing.assert_allclose(out["obs"], obs, atol=1e-10)
    np.testing.assert_array_equal(out["cam_ids"], cam_ids)
    np.testing.assert_array_equal(out["point_ids"], point_ids)


def test_bal_prune():
    bal = dict(
        cam_params=np.zeros((2, 9)),
        points=np.zeros((3, 3)),
        obs=np.zeros((3, 2)),
        cam_ids=np.array([0, 1, 0]),
        point_ids=np.array([0, 0, 2]),  # point 1 unseen, point 2 seen once
    )
    out = balio.prune(bal, min_track_len=2)
    assert out["points"].shape[0] == 1
    assert out["obs"].shape[0] == 2
    np.testing.assert_array_equal(out["point_ids"], [0, 0])


def test_bal_file_ba_converges():
    """Bundled toy BAL file -> build_bal graph -> GBP reaches the dense MAP."""
    problem = balio.prune(balio.read_bal(os.path.join(DATA, "toy_ba.txt")))
    sim = balio.to_sim(problem, pix_sigma=1.0)
    graph, means, px_scale = ba.build_bal(sim, dtype=jnp.float64)
    state = init_state(graph, means)
    are0 = float(ba.avg_reprojection_error(graph, state, px_scale=px_scale))
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    for _ in range(3):
        state = run(graph, state, cfg, 15)
        graph = ba.weaken_priors(graph, 0.1)
    state = run(graph, state, cfg, 15)
    are = float(ba.avg_reprojection_error(graph, state, px_scale=px_scale))
    assert are < are0, (are0, are)
    assert are < 1.5, are  # pix_sigma-level residual (E||r|| ~ 1.25 for sigma=1)

    # Parity with the dense MAP at the final linearization (SURVEY.md §3.4).
    mu = oracle.map_solution(graph, state)
    ref = ba.with_means(state, mu)
    are_map = float(ba.avg_reprojection_error(graph, ref, px_scale=px_scale))
    assert abs(are - are_map) < 0.05, (are, are_map)


def test_g2o_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    poses = rng.standard_normal((4, 3))
    ij = np.array([[0, 1], [1, 2], [2, 3], [0, 3]])
    z = rng.standard_normal((4, 3))
    info = np.tile(np.diag([4.0, 4.0, 25.0]), (4, 1, 1))
    path = tmp_path / "x.g2o"
    g2oio.write_g2o_se2(path, poses, ij, z, info)
    out = g2oio.read_g2o(path)
    assert out["kind"] == "se2"
    np.testing.assert_allclose(out["poses"], poses, atol=1e-10)
    np.testing.assert_array_equal(out["edges_ij"], ij)
    np.testing.assert_allclose(out["edges_z"], z, atol=1e-10)
    np.testing.assert_allclose(out["edges_info"], info, atol=1e-10)


def test_g2o_se3_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    poses = rng.standard_normal((3, 6)) * 0.5
    ij = np.array([[0, 1], [1, 2]])
    z = rng.standard_normal((2, 6)) * 0.3
    info = np.tile(np.diag([4.0, 4.0, 4.0, 25.0, 25.0, 25.0]), (2, 1, 1))
    path = tmp_path / "x3.g2o"
    g2oio.write_g2o_se3(path, poses, ij, z, info)
    out = g2oio.read_g2o(path)
    assert out["kind"] == "se3"
    np.testing.assert_allclose(out["poses"], poses, atol=1e-8)
    np.testing.assert_array_equal(out["edges_ij"], ij)
    np.testing.assert_allclose(out["edges_z"], z, atol=1e-8)
    np.testing.assert_allclose(out["edges_info"], info, atol=1e-9)


def test_g2o_file_slam_converges():
    data = g2oio.read_g2o(os.path.join(DATA, "manhattan_sim.g2o"))
    sub = dict(
        kind="se2",
        poses=data["poses"][:80],
        edges_ij=data["edges_ij"][:79],  # odometry chain prefix
        edges_z=data["edges_z"][:79],
        edges_info=data["edges_info"][:79],
    )
    graph, means = pose_graph.build_g2o(sub, dtype=jnp.float64)
    state = init_state(graph, means)
    cfg = pose_graph.default_config()
    state = run(graph, state, cfg, 100)
    mu = oracle.map_solution(graph, state)
    err = float(jnp.abs(state.v[0].mean - mu[0]).max())
    assert err < 1e-2, err
