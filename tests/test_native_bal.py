"""Native C++ BAL parser == pure-Python parser, bit for bit."""
import os
import shutil

import numpy as np
import pytest

from gbp_tpu.io import bal as balio
from gbp_tpu.io import _native

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_native_parser_matches_python():
    assert _native.get_lib() is not None, "native parser failed to build"
    path = os.path.join(DATA, "toy_ba.txt")
    a = balio.read_bal(path, native=True)
    b = balio.read_bal(path, native=False)
    for k in ("cam_params", "points", "obs"):
        np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0)
    for k in ("cam_ids", "point_ids"):
        np.testing.assert_array_equal(a[k], b[k])


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_native_parser_rejects_garbage():
    assert _native.get_lib() is not None
    with pytest.raises(ValueError):
        _native.parse_bal_bytes(b"2 1 1\n0 0 1.0")  # truncated
    with pytest.raises(ValueError):
        _native.parse_bal_bytes(
            b"1 1 1\n0 0 1.0 2.0\n" + b"0.0\n" * 9 + b"0.0\n" * 3 + b"99\n"
        )  # trailing token


def test_native_g2o_matches_python_parser(tmp_path):
    """fastg2o.cpp + vectorized assembly == the pure-Python line parser,
    for both SE2 and SE3 (quat conversion + info-frame conjugation)."""
    import numpy as np

    from gbp_tpu.io import g2o as g2oio
    from gbp_tpu.io._native import parse_g2o_bytes
    from gbp_tpu.models import pose_graph

    # SE2: write a Manhattan sim out and read it back both ways.
    sim = pose_graph.simulate_manhattan(n_poses=40, seed=1, loop_prob=0.4)
    p2 = tmp_path / "m.g2o"
    graph, means = pose_graph.build(sim)
    ij = np.concatenate([sim["odom_ij"], sim["loop_ij"]])
    z = np.concatenate([sim["odom_z"], sim["loop_z"]])
    sig = np.concatenate([
        np.broadcast_to(sim["odom_sigma"], sim["odom_z"].shape),
        np.broadcast_to(sim["loop_sigma"], sim["loop_z"].shape)])
    info = np.zeros((z.shape[0], 3, 3))
    info[:, np.arange(3), np.arange(3)] = 1.0 / sig**2
    g2oio.write_g2o_se2(str(p2), np.asarray(means[0]), ij, z, info)
    assert parse_g2o_bytes(p2.read_bytes()) is not None  # native built
    a = g2oio.read_g2o(str(p2))
    b = g2oio._read_g2o_python(str(p2))
    assert a["kind"] == b["kind"] == "se2"
    for k in ("poses", "edges_ij", "edges_z", "edges_info"):
        np.testing.assert_allclose(a[k], b[k], rtol=1e-12, atol=1e-12)

    # SE3: helical sim via the SE3 writer.
    from tests.test_se3_pose_graph import simulate_se3

    data = simulate_se3(n_poses=15, seed=3)
    p3 = tmp_path / "h.g2o"
    g2oio.write_g2o_se3(str(p3), data["poses"], data["edges_ij"],
                        data["edges_z"], data["edges_info"])
    a = g2oio.read_g2o(str(p3))
    b = g2oio._read_g2o_python(str(p3))
    assert a["kind"] == b["kind"] == "se3"
    for k in ("poses", "edges_ij", "edges_z", "edges_info"):
        np.testing.assert_allclose(a[k], b[k], rtol=1e-9, atol=1e-9)


def test_native_g2o_duplicate_vertex_last_wins(tmp_path):
    """Duplicate vertex ids keep the LAST definition in both parsers (the
    Python parser's dict semantics)."""
    from gbp_tpu.io import g2o as g2oio

    p = tmp_path / "dup.g2o"
    p.write_text(
        "VERTEX_SE2 0 0 0 0\n"
        "VERTEX_SE2 1 1 0 0\n"
        "VERTEX_SE2 1 2 0 0\n"
        "EDGE_SE2 0 1 1 0 0 1 0 0 1 0 1\n")
    import numpy as np

    a = g2oio.read_g2o(str(p))
    b = g2oio._read_g2o_python(str(p))
    np.testing.assert_allclose(a["poses"], b["poses"])
    assert a["poses"][1, 0] == 2.0  # the later definition won
