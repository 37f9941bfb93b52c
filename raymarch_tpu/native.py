"""ctypes bindings for the native (C++) tape core.

The reference's tape builder / scene model are native (Rust); this binds the
TPU build's C++ counterpart (native/tape_core.cpp): wire-tape validation, a
second independent oracle evaluator/marcher, and a native fast-path encoder
for large procedural scenes. Auto-builds with `make` on first use if g++ is
available; every entry point has a pure-Python/NumPy fallback, so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtape_core.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.tape_validate.restype = ctypes.c_int64
    lib.tape_validate.argtypes = [u32p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
    lib.tape_eval.restype = ctypes.c_int32
    lib.tape_eval.argtypes = [
        u32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_float, f32p,
    ]
    lib.tape_march.restype = ctypes.c_int32
    lib.tape_march.argtypes = [
        u32p, ctypes.c_int64, f32p, f32p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_int32, f32p, u8p,
    ]
    lib.tape_build_sphere_union.restype = ctypes.c_int64
    lib.tape_build_sphere_union.argtypes = [
        f32p, ctypes.c_int64, u32p, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def validate(tape: np.ndarray) -> tuple[int, int]:
    """(cmd_count, max_stack_depth); raises ValueError on malformed tape."""
    lib = _load()
    tape = np.ascontiguousarray(tape, dtype=np.uint32)
    if lib is None:
        from .ops.tape import compile_wire, wire_cmd_count

        spec, arrays = compile_wire(tape, bucket=False)
        real = arrays.tape_ops != 0
        depth = int(arrays.out_slot[real].max()) + 1 if real.any() else 0
        return wire_cmd_count(tape), depth
    depth = ctypes.c_int32(0)
    n = lib.tape_validate(tape, tape.size, ctypes.byref(depth))
    if n < 0:
        raise ValueError(f"malformed wire tape (native error {n})")
    return int(n), int(depth.value)


def eval_tape(tape: np.ndarray, points: np.ndarray, empty_value: float = 100.0) -> np.ndarray:
    """Native oracle: scene SDF at points[N,3] -> f32[N]."""
    lib = _load()
    if lib is None:
        from .ops import oracle

        return oracle.eval_tape(tape, points)
    tape = np.ascontiguousarray(tape, dtype=np.uint32)
    pts = np.ascontiguousarray(points, dtype=np.float32).reshape(-1, 3)
    out = np.empty(pts.shape[0], dtype=np.float32)
    rc = lib.tape_eval(tape, tape.size, pts, pts.shape[0], empty_value, out)
    if rc != 0:
        raise ValueError(f"malformed wire tape (native error {rc})")
    return out


def march(tape, origins, dirs, min_dist=0.01, max_dist=100.0, max_iter=100):
    """Native oracle sphere-trace -> (t f32[N], hit bool[N])."""
    lib = _load()
    if lib is None:
        from .config import RenderConfig
        from .ops import oracle

        cfg = RenderConfig(min_dist=min_dist, max_dist=max_dist, max_iter=max_iter)
        return oracle.march(tape, origins, dirs, cfg)
    tape = np.ascontiguousarray(tape, dtype=np.uint32)
    o = np.ascontiguousarray(origins, dtype=np.float32).reshape(-1, 3)
    d = np.ascontiguousarray(dirs, dtype=np.float32).reshape(-1, 3)
    t = np.empty(o.shape[0], dtype=np.float32)
    hit = np.empty(o.shape[0], dtype=np.uint8)
    rc = lib.tape_march(
        tape, tape.size, o, d, o.shape[0], min_dist, max_dist, max_iter, t, hit
    )
    if rc != 0:
        raise ValueError(f"malformed wire tape (native error {rc})")
    return t, hit.astype(bool)


def build_sphere_union(spheres: np.ndarray) -> np.ndarray:
    """Fast-path native encoder: spheres f32[N,4] (cx,cy,cz,r) -> wire tape
    of their union (postorder left-leaning chain)."""
    spheres = np.ascontiguousarray(spheres, dtype=np.float32).reshape(-1, 4)
    lib = _load()
    if lib is None:
        from .models.csg import sphere
        from .ops.tape import encode_wire

        node = None
        for cx, cy, cz, r in spheres:
            s = sphere(center=(cx, cy, cz), radius=float(r))
            node = s if node is None else (node | s)
        return encode_wire(node)
    cap = spheres.shape[0] * 6 + 8
    out = np.empty(cap, dtype=np.uint32)
    n = lib.tape_build_sphere_union(spheres, spheres.shape[0], out, cap)
    if n < 0:
        raise RuntimeError("tape_build_sphere_union: buffer too small")
    return out[:n].copy()
