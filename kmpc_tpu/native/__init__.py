"""ctypes bindings for the native host-side MPC solver.

Builds ``native/mpc_solver.cpp`` on demand with g++ (cached next to the
source) and exposes :func:`solve_mpc_log_utility_native` and
:func:`solve_mpc_mean_variance_native`. This is the framework's native
runtime component — the role the ECOS/SCS C solvers played for the
reference (reference: mpc.py:107-111) — used as a CPU fallback and as
an independent cross-check of the TPU solvers.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "mpc_solver.cpp"
_LIB = _NATIVE_DIR / "libkmpc_native.so"

_lib: Optional[ctypes.CDLL] = None


class NativeBuildError(RuntimeError):
    pass


def build_native(force: bool = False) -> Path:
    """Compile the shared library if missing/stale. Returns its path."""
    if _LIB.exists() and not force:
        if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC",
        "-o", str(_LIB), str(_SRC),
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except FileNotFoundError as e:
        raise NativeBuildError("g++ not found") from e
    if res.returncode != 0:
        # Retry without OpenMP (toolchains without libgomp).
        cmd_noomp = [c for c in cmd if c != "-fopenmp"]
        res = subprocess.run(cmd_noomp, capture_output=True, text=True, timeout=300)
        if res.returncode != 0:
            raise NativeBuildError(f"native build failed:\n{res.stderr}")
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    build_native()
    lib = ctypes.CDLL(str(_LIB))
    lib.kmpc_solve_log_utility.restype = ctypes.c_int
    lib.kmpc_solve_log_utility.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # current_weights
        ctypes.POINTER(ctypes.c_float),  # pred_log_returns
        ctypes.c_int, ctypes.c_int, ctypes.c_int,           # B, H, N
        ctypes.c_float, ctypes.c_float, ctypes.c_int,       # cost, turnover, short
        ctypes.c_int, ctypes.c_float, ctypes.c_float,       # iters, sigma, step
        ctypes.c_float,                                     # ridge
        ctypes.POINTER(ctypes.c_float),                     # out
    ]
    lib.kmpc_solve_mean_variance.restype = ctypes.c_int
    lib.kmpc_solve_mean_variance.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # current_weights
        ctypes.POINTER(ctypes.c_float),  # mu
        ctypes.POINTER(ctypes.c_float),  # sigma_mats
        ctypes.c_int, ctypes.c_int, ctypes.c_int,           # B, H, N
        ctypes.c_float, ctypes.c_float, ctypes.c_int,       # gamma, cost, short
        ctypes.c_int, ctypes.c_float, ctypes.c_float,       # iters, sigma, step
        ctypes.POINTER(ctypes.c_float),                     # out
    ]
    lib.kmpc_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except NativeBuildError:
        return False


def num_threads() -> int:
    return int(_load().kmpc_num_threads())


def solve_mpc_log_utility_native(
    current_weights: np.ndarray,
    predicted_log_returns: np.ndarray,
    cost_coeff: float = 0.001,
    max_turnover: float = 0.2,
    allow_short: bool = False,
    max_iters: int = 2000,
    sigma_scale: float = 2.0,
    step_scale: float = 1.0,
    ridge: float = 0.0,
) -> Tuple[np.ndarray, Dict]:
    """Batched host solve. Accepts [N]/[H,N] or [B,N]/[B,H,N]; returns
    weights with matching batch shape."""
    lib = _load()
    cw = np.ascontiguousarray(current_weights, dtype=np.float32)
    ys = np.ascontiguousarray(predicted_log_returns, dtype=np.float32)
    single = ys.ndim == 2
    if single:
        cw = cw[None]
        ys = ys[None]
    B, H, N = ys.shape
    out = np.empty((B, H, N), dtype=np.float32)
    ret = lib.kmpc_solve_log_utility(
        cw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B, H, N,
        float(cost_coeff), float(max_turnover), int(allow_short),
        int(max_iters), float(sigma_scale), float(step_scale), float(ridge),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    info = {"status": "optimal" if ret == 0 else f"error_{ret}"}
    if ret != 0:
        raise RuntimeError(f"native solver returned {ret}")
    return (out[0] if single else out), info


def solve_mpc_mean_variance_native(
    current_weights: np.ndarray,
    mu: np.ndarray,
    sigma_mats: np.ndarray,
    gamma: float = 1.0,
    cost_coeff: float = 0.001,
    allow_short: bool = False,
    max_iters: int = 2000,
    sigma_scale: float = 2.0,
    step_scale: float = 1.0,
) -> Tuple[np.ndarray, Dict]:
    """Batched host mean-variance solve (the Markowitz baseline's
    program; same iteration as ops/mpc.py::solve_mpc_mean_variance_batch
    in double precision). Accepts [N]/[H,N]/[N,N] or batched
    [B,N]/[B,H,N]/[B,N,N]; a single [N,N] Sigma broadcasts over B."""
    lib = _load()
    cw = np.ascontiguousarray(current_weights, dtype=np.float32)
    m = np.ascontiguousarray(mu, dtype=np.float32)
    single = m.ndim == 2
    if single:
        cw = cw[None]
        m = m[None]
    B, H, N = m.shape
    sig = np.ascontiguousarray(
        np.broadcast_to(np.asarray(sigma_mats, dtype=np.float32), (B, N, N))
    )
    out = np.empty((B, H, N), dtype=np.float32)
    ret = lib.kmpc_solve_mean_variance(
        cw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B, H, N,
        float(gamma), float(cost_coeff), int(allow_short),
        int(max_iters), float(sigma_scale), float(step_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if ret != 0:
        raise RuntimeError(f"native MV solver returned {ret}")
    return (out[0] if single else out), {"status": "optimal"}
