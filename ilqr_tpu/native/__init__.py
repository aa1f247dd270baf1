"""Native (C++) host-side runtime components.

``scenario_gen``: cubic-spline reference-line construction + agent routing
generation (the data-loader hot path for batched sweeps), built on demand
with g++ into a shared library and bound via ctypes. Falls back cleanly to
the pure-Python implementations in ``ilqr_tpu.utils.splines`` /
``ilqr_tpu.sim.scenario`` when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "scenario_gen.cpp")
_LIB = os.path.join(_HERE, "libscenario_gen.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """The bound library, building it on first use; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        path = _LIB if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC) else _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.ilqr_refline_build.restype = ctypes.c_int64
        lib.ilqr_refline_build.argtypes = [
            dp, dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double, dp,
            ctypes.c_int64,
        ]
        lib.ilqr_routing_generate.restype = ctypes.c_int64
        lib.ilqr_routing_generate.argtypes = [
            dp, dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, ctypes.c_uint64, ctypes.c_double,
            dp, ctypes.c_int64,
        ]
        lib.ilqr_routing_generate_batch.restype = None
        lib.ilqr_routing_generate_batch.argtypes = [
            dp, dp, ctypes.c_int64, ctypes.c_int64, ip, dp, dp, dp,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
            dp,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def refline_build(knots_x, knots_y, width: float, accuracy: float = 0.1) -> np.ndarray:
    """(P, 4) [x, y, yaw, s] dense offset line (native)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native scenario_gen unavailable")
    kx = np.ascontiguousarray(knots_x, dtype=np.float64)
    ky = np.ascontiguousarray(knots_y, dtype=np.float64)
    n = lib.ilqr_refline_build(_dptr(kx), _dptr(ky), len(kx), width, accuracy,
                               None, 0)
    out = np.zeros((n, 4), dtype=np.float64)
    lib.ilqr_refline_build(_dptr(kx), _dptr(ky), len(kx), width, accuracy,
                           _dptr(out), n)
    return out


def routing_generate(knots_x, knots_y, line_width: float, start_s: float,
                     v0: float, yaw0: float, delta_t: float, total_time: float,
                     noise: bool = False, seed: int = 0,
                     noise_std: float = 0.02) -> np.ndarray:
    """(T, 3) [x, y, yaw] routing line (native)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native scenario_gen unavailable")
    kx = np.ascontiguousarray(knots_x, dtype=np.float64)
    ky = np.ascontiguousarray(knots_y, dtype=np.float64)
    n = lib.ilqr_routing_generate(_dptr(kx), _dptr(ky), len(kx), line_width,
                                  start_s, v0, yaw0, delta_t, total_time,
                                  int(noise), seed, noise_std, None, 0)
    out = np.zeros((n, 3), dtype=np.float64)
    lib.ilqr_routing_generate(_dptr(kx), _dptr(ky), len(kx), line_width,
                              start_s, v0, yaw0, delta_t, total_time,
                              int(noise), seed, noise_std, _dptr(out), n)
    return out


def routing_generate_batch(knots_xy, line_widths, veh_line, veh_start, veh_v0,
                           veh_yaw0, delta_t: float, total_time: float,
                           n_variants: int, noise: bool = True, seed: int = 0,
                           noise_std: float = 0.02) -> np.ndarray:
    """(n_variants, V, T, 3) noisy routing variants, OpenMP-parallel.

    knots_xy: (L, n_knots, 2) with [:, :, 0] = x and [:, :, 1] = y stored as
    two contiguous runs per line (x knots then y knots).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native scenario_gen unavailable")
    knots = np.ascontiguousarray(knots_xy, dtype=np.float64)
    L, n_knots = knots.shape[0], knots.shape[1]
    # repack to per-line [x..., y...] layout the C side expects
    packed = np.concatenate(
        [np.stack([knots[l, :, 0], knots[l, :, 1]]).reshape(-1) for l in range(L)]
    )
    widths = np.ascontiguousarray(line_widths, dtype=np.float64)
    vline = np.ascontiguousarray(veh_line, dtype=np.int64)
    vstart = np.ascontiguousarray(veh_start, dtype=np.float64)
    vv0 = np.ascontiguousarray(veh_v0, dtype=np.float64)
    vyaw = np.ascontiguousarray(veh_yaw0, dtype=np.float64)
    V = len(vline)
    T = int(np.ceil(total_time / delta_t - 1e-12))
    out = np.zeros((n_variants, V, T, 3), dtype=np.float64)
    lib.ilqr_routing_generate_batch(
        _dptr(packed), _dptr(widths), L, n_knots,
        vline.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _dptr(vstart), _dptr(vv0), _dptr(vyaw), V, delta_t, total_time,
        int(noise), seed, noise_std, n_variants, T, _dptr(out))
    return out
