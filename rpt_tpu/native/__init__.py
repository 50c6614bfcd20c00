"""Native (C++) components: build machinery + ctypes bindings.

The reference's native tier is its Rust core (kd-tree build, rayon).
Here the device compute path is JAX/XLA; the host-side runtime pieces that
benefit from native code — BVH construction over ~10^6 primitives and
binary asset parsing — are C++, compiled on first use with g++ and loaded
via ctypes (no pybind11 dependency). Every native component has a pure
numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")


def _compile(name: str, sources: list[str]) -> str | None:
    """Compile a shared library (cached by mtime). Returns path or None."""
    os.makedirs(_BUILD, exist_ok=True)
    so_path = os.path.join(_BUILD, f"{name}.so")
    srcs = [os.path.join(_DIR, s) for s in sources]
    if os.path.exists(so_path) and all(
        os.path.getmtime(so_path) >= os.path.getmtime(s) for s in srcs
    ):
        return so_path
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", so_path, *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return so_path
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        msg = getattr(e, "stderr", b"")
        print(f"rpt_tpu: native build of {name} failed ({e}); {msg[:400]}", file=sys.stderr)
        return None


_bvh_lib = None
_bvh_tried = False


def _load_bvh():
    global _bvh_lib, _bvh_tried
    if _bvh_tried:
        return _bvh_lib
    _bvh_tried = True
    path = _compile("bvh_builder", ["bvh_builder.cpp"])
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.bvh_build.restype = ctypes.c_void_p
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.bvh_num_nodes.restype = ctypes.c_int32
    lib.bvh_num_nodes.argtypes = [ctypes.c_void_p]
    lib.bvh_export.restype = None
    lib.bvh_export.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_float)] * 2 + [
        ctypes.POINTER(ctypes.c_int32)
    ] * 5
    lib.bvh_free.restype = None
    lib.bvh_free.argtypes = [ctypes.c_void_p]
    _bvh_lib = lib
    return lib


def build_bvh_sah(bb_min: np.ndarray, bb_max: np.ndarray, leaf_size: int):
    """Binned-SAH build via the C++ library. Returns a FlatBVH, or None if
    the native library is unavailable."""
    lib = _load_bvh()
    if lib is None:
        return None
    from ..accel.bvh import FlatBVH

    bb_min = np.ascontiguousarray(bb_min, np.float32).reshape(-1, 3)
    bb_max = np.ascontiguousarray(bb_max, np.float32).reshape(-1, 3)
    n = len(bb_min)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    handle = lib.bvh_build(
        bb_min.ctypes.data_as(fp), bb_max.ctypes.data_as(fp), n, int(leaf_size)
    )
    try:
        k = lib.bvh_num_nodes(handle)
        out_min = np.empty((k, 3), np.float32)
        out_max = np.empty((k, 3), np.float32)
        left = np.empty(k, np.int32)
        right = np.empty(k, np.int32)
        first = np.empty(k, np.int32)
        count = np.empty(k, np.int32)
        perm = np.empty(max(n, 1), np.int32)
        lib.bvh_export(
            handle,
            out_min.ctypes.data_as(fp),
            out_max.ctypes.data_as(fp),
            left.ctypes.data_as(ip),
            right.ctypes.data_as(ip),
            first.ctypes.data_as(ip),
            count.ctypes.data_as(ip),
            perm.ctypes.data_as(ip),
        )
    finally:
        lib.bvh_free(handle)
    rope = np.full(k, -1, np.int32)  # unused by the pair-packed layout
    return FlatBVH(out_min, out_max, left, right, first, count, rope, perm[:n])
