"""ctypes loader for the native parsers (io/native/*.cpp).

Compiles on first use with g++ into a per-user cache dir; any failure
(no compiler, unusual platform) silently falls back to the pure-Python
parsers in io/bal.py and io/g2o.py.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_libs: dict = {}


def _build(src: str) -> str | None:
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    name = os.path.splitext(os.path.basename(src))[0]
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "gbp_tpu",
    )
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"{name}-{tag}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".tmp{os.getpid()}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return so
    except Exception:
        return None


def _get(src_name: str):
    """Build+load a native parser library, or None (Python fallback)."""
    if src_name in _libs:
        return _libs[src_name]
    _libs[src_name] = None
    so = _build(os.path.join(_HERE, "native", src_name))
    if so is not None:
        try:
            _libs[src_name] = ctypes.CDLL(so)
        except OSError:
            pass
    return _libs[src_name]


def get_lib():
    """The BAL parser library or None (kept for io/bal.py and tests)."""
    lib = _get("fastbal.cpp")
    if lib is not None:
        lib.bal_header.restype = ctypes.c_int
        lib.bal_parse.restype = ctypes.c_int
    return lib


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


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def parse_g2o_bytes(data: bytes):
    """Parse a g2o text buffer natively -> raw row arrays, or None.

    Returns dict(v2_id, v2 [n,3], e2_ij [m,2], e2 [m,9],
                 v3_id, v3 [n,7], e3_ij [m,2], e3 [m,28]) — quaternion and
    information-frame handling are the (vectorized) caller's job."""
    lib = _get("fastg2o.cpp")
    if lib is None:
        return None
    lib.g2o_count.restype = ctypes.c_int
    lib.g2o_parse.restype = ctypes.c_int
    counts = np.zeros(4, dtype=np.int64)
    if lib.g2o_count(data, ctypes.c_int64(len(data)), _i64p(counts)) != 0:
        raise ValueError("g2o count pass failed")
    nv2, ne2, nv3, ne3 = (int(x) for x in counts)
    v2_id = np.empty(nv2, dtype=np.int64)
    v2 = np.empty((nv2, 3), dtype=np.float64)
    e2_ij = np.empty((ne2, 2), dtype=np.int64)
    e2 = np.empty((ne2, 9), dtype=np.float64)
    v3_id = np.empty(nv3, dtype=np.int64)
    v3 = np.empty((nv3, 7), dtype=np.float64)
    e3_ij = np.empty((ne3, 2), dtype=np.int64)
    e3 = np.empty((ne3, 28), dtype=np.float64)
    rc = lib.g2o_parse(data, ctypes.c_int64(len(data)),
                       _i64p(v2_id), _f64p(v2), _i64p(e2_ij), _f64p(e2),
                       _i64p(v3_id), _f64p(v3), _i64p(e3_ij), _f64p(e3))
    if rc != 0:
        raise ValueError("malformed g2o line")
    return dict(v2_id=v2_id, v2=v2, e2_ij=e2_ij, e2=e2,
                v3_id=v3_id, v3=v3, e3_ij=e3_ij, e3=e3)
