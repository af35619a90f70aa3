"""ctypes bindings for the native runtime library (native/*.cpp).

Builds on first use if the shared object is missing (g++ direct — no build
system needed at runtime); degrades gracefully when the toolchain or image
libraries are unavailable, in which case callers fall back to the PIL/numpy
paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpacknet_native.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    sources = [os.path.join(_NATIVE_DIR, s)
               for s in ("image_pipeline.cpp", "posegraph_solver.cpp")]
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           *sources, "-ljpeg", "-lpng", "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        out = getattr(e, "stderr", b"")
        print(f"native build failed: {e} {out[:500] if out else ''}")
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_SO_PATH):
        src_newer = True
    else:
        src_newer = any(
            os.path.getmtime(os.path.join(_NATIVE_DIR, s)) > os.path.getmtime(_SO_PATH)
            for s in ("image_pipeline.cpp", "posegraph_solver.cpp"))
    if src_newer and not _build():
        _build_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        print(f"native load failed: {e}")
        _build_failed = True
        return None
    lib.pn_load_batch.restype = ctypes.c_int
    lib.pn_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.pn_decode_image.restype = ctypes.c_int
    lib.pn_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.pn_thread_count.restype = ctypes.c_int
    lib.pn_solve_pose_graph.restype = ctypes.c_double
    lib.pn_solve_pose_graph.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return _lib


def native_available() -> bool:
    return load_native() is not None


def load_image_batch(paths: Sequence[str], height: int, width: int) -> np.ndarray:
    """Threaded native decode+resize of a file batch -> [N, H, W, 3] f32."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    out = np.empty((n, height, width, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.pn_load_batch(
        arr, n, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if failures:
        raise IOError(f"{failures}/{n} images failed to decode")
    return out


_decode_tls = None


def decode_image(path: str) -> Optional[np.ndarray]:
    """Native single-image decode at source resolution -> [H, W, 3] u8.

    Thread-safe (per-thread scratch buffer); returns None when the native
    library is unavailable so callers can fall back to PIL. This is the
    loader hot path: libjpeg/libpng decode without PIL's Python-object and
    mode-conversion overhead (~3-7x per decode, docs/STATUS.md input
    pipeline numbers).
    """
    global _decode_tls
    lib = load_native()
    if lib is None:
        return None
    if _decode_tls is None:
        import threading
        _decode_tls = threading.local()
    buf = getattr(_decode_tls, "buf", None)
    if buf is None:
        buf = np.empty(32 * 1024 * 1024, np.uint8)  # fits ~3300x3300 RGB
        _decode_tls.buf = buf
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.pn_decode_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, ctypes.byref(w), ctypes.byref(h))
    if rc == -2:  # buffer too small: grow once and retry
        need_probe = 4 * buf.size
        buf = np.empty(need_probe, np.uint8)
        _decode_tls.buf = buf
        rc = lib.pn_decode_image(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.size, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return (buf[: h.value * w.value * 3]
            .reshape(h.value, w.value, 3).copy())


def solve_pose_graph_native(
    poses: np.ndarray, edges: dict, num_iterations: int = 12,
    rot_weight: float = 100.0, optimize_scales: bool = True,
    pose_prior: float = 1e6, scale_prior: float = 1e6,
    damping: float = 1e-6,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Host-side pose-graph solve; same contract as optimize_pose_graph."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = poses.shape[0]
    poses_io = np.ascontiguousarray(poses, np.float64).copy()
    ei = np.ascontiguousarray(edges["i"], np.int32)
    ej = np.ascontiguousarray(edges["j"], np.int32)
    Z = np.ascontiguousarray(edges["Z"], np.float64)
    w = np.ascontiguousarray(edges["w"], np.float64)
    scales = np.zeros(n, np.float64)
    cost = lib.pn_solve_pose_graph(
        n, poses_io.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(ei),
        ei.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ej.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        Z.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        num_iterations, rot_weight, int(optimize_scales),
        pose_prior, scale_prior, damping,
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if cost < 0:
        raise RuntimeError("native pose graph solve failed (non-SPD system)")
    return poses_io, scales, float(cost)
