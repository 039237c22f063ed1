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
