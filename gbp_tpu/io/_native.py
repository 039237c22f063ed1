"""ctypes loader for the native BAL parser (io/native/fastbal.cpp).

Compiles on first use with g++ into a per-user cache dir; any failure
(no compiler, unusual platform) silently falls back to the pure-Python
parser in io/bal.py.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "fastbal.cpp")
_lib = None
_tried = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "gbp_tpu",
    )
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"fastbal-{tag}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".tmp{os.getpid()}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return so
    except Exception:
        return None


def get_lib():
    """Returns the loaded library or None (fallback to Python parsing)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.bal_header.restype = ctypes.c_int
        lib.bal_parse.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def parse_bal_bytes(data: bytes):
    """Parse a BAL text buffer natively; returns the read_bal dict or None."""
    lib = get_lib()
    if lib is None:
        return None
    n_cams = ctypes.c_int64()
    n_points = ctypes.c_int64()
    n_obs = ctypes.c_int64()
    rc = lib.bal_header(data, ctypes.c_int64(len(data)),
                        ctypes.byref(n_cams), ctypes.byref(n_points),
                        ctypes.byref(n_obs))
    if rc != 0:
        raise ValueError("invalid BAL header")
    nc, npt, no = n_cams.value, n_points.value, n_obs.value
    cam_ids = np.empty(no, dtype=np.int64)
    point_ids = np.empty(no, dtype=np.int64)
    obs = np.empty((no, 2), dtype=np.float64)
    cam_params = np.empty((nc, 9), dtype=np.float64)
    points = np.empty((npt, 3), dtype=np.float64)
    rc = lib.bal_parse(
        data, ctypes.c_int64(len(data)),
        cam_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        point_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        obs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cam_params.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc == 1:
        raise ValueError("truncated/garbled BAL file")
    if rc == 2:
        raise ValueError("trailing tokens in BAL file")
    return dict(cam_params=cam_params, points=points, obs=obs,
                cam_ids=cam_ids, point_ids=point_ids)
