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


def _random_spd(rng, n, d):
    a = rng.standard_normal((n, d, d))
    return a @ a.transpose(0, 2, 1) + 3.0 * np.eye(d)


def test_g2o_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    poses = rng.standard_normal((4, 3))
    ij = np.array([[0, 1], [1, 2], [2, 3], [0, 3]])
    z = rng.standard_normal((4, 3))
    # Anisotropic info: exercises the error-frame conjugation, which must be
    # inverted exactly by the writer.
    info = _random_spd(rng, 4, 3)
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
    info = _random_spd(rng, 2, 6)
    path = tmp_path / "x3.g2o"
    g2oio.write_g2o_se3(path, poses, ij, z, info)
    out = g2oio.read_g2o(path)
    assert out["kind"] == "se3"
    np.testing.assert_allclose(out["poses"], poses, atol=1e-8)
    np.testing.assert_array_equal(out["edges_ij"], ij)
    np.testing.assert_allclose(out["edges_z"], z, atol=1e-8)
    np.testing.assert_allclose(out["edges_info"], info, atol=1e-7)


def test_g2o_info_frame_energy_invariance(tmp_path):
    """The info conjugation on load must make our residual's quadratic energy
    equal g2o's own error energy EXACTLY, for any (not just small) residual:
    e_g2o = -blockdiag(R_z^T, I) @ e_ours, so e^T Lam e is invariant when
    Lam_ours = A Lam_g2o A^T with A = blockdiag(R_z, I)."""
    import jax.numpy as jnp

    from gbp_tpu.factors.se3 import se3_between
    from gbp_tpu.utils.lie import so3_exp, so3_log

    rng = np.random.default_rng(7)
    info_file = _random_spd(rng, 1, 6)[0]  # strongly anisotropic
    z_row = rng.standard_normal(6) * 0.8
    xi = rng.standard_normal(6) * 0.6
    xj = rng.standard_normal(6) * 0.6

    # Write an edge with info in g2o's convention, read it back (conjugated).
    path = tmp_path / "edge.g2o"
    g2oio.write_g2o_se3(
        path, np.stack([xi, xj]), np.array([[0, 1]]), z_row[None],
        # write_g2o_se3 expects info in OUR convention and converts to the
        # file frame; to plant a known FILE-frame info, pre-conjugate forward.
        g2oio._conj_info_se3(info_file, np.asarray(so3_exp(jnp.asarray(z_row[3:]))))[None],
    )
    out = g2oio.read_g2o(path)
    info_ours = out["edges_info"][0]
    z_read = out["edges_z"][0]

    # Our factor's residual at (xi, xj).
    ft = se3_between()
    h = np.asarray(ft.meas(jnp.concatenate([jnp.asarray(xi), jnp.asarray(xj)]), None))
    e_ours = np.asarray(ft.residual(jnp.asarray(z_read), jnp.asarray(h)))

    # g2o's error vector e = vec(Z^-1 X_i^-1 X_j), translation in frame Z.
    ri = np.asarray(so3_exp(jnp.asarray(xi[3:])))
    rj = np.asarray(so3_exp(jnp.asarray(xj[3:])))
    rz = np.asarray(so3_exp(jnp.asarray(z_row[3:])))
    r_delta = ri.T @ rj
    t_delta = ri.T @ (xj[:3] - xi[:3])
    t_e = rz.T @ (t_delta - z_row[:3])
    w_e = np.asarray(so3_log(jnp.asarray(rz.T @ r_delta)))
    e_g2o = np.concatenate([t_e, w_e])

    energy_ours = e_ours @ info_ours @ e_ours
    energy_g2o = e_g2o @ info_file @ e_g2o
    np.testing.assert_allclose(energy_ours, energy_g2o, rtol=1e-7)
    # And the naive (unconjugated) use of the file info would NOT match.
    energy_naive = e_ours @ info_file @ e_ours
    assert abs(energy_naive - energy_g2o) > 1e-3 * abs(energy_g2o)


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
