"""Build-on-first-import for the native (C++) data-loader core.

Compiles ``native_ops.cpp`` with g++ into a shared library cached next to
the source (keyed by a source+flags hash, so edits rebuild and upgrades
never load a stale binary). Compilation is atomic (temp file + rename) so
concurrent data workers can race safely. Every caller must tolerate
``load() -> None`` — the pure-numpy paths remain as fallback when no
toolchain is present.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "native_ops.cpp")
_FLAGS = ["-O3", "-fPIC", "-shared", "-fopenmp", "-std=c++17"]
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _target_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read() + " ".join(_FLAGS).encode()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "BASEDET_NATIVE_CACHE", os.path.join(os.path.dirname(_SRC), "_build")
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"native_ops-{digest}.so")


def _compile(target: str) -> bool:
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(target))
    os.close(fd)
    try:
        subprocess.run(
            ["g++", *_FLAGS, _SRC, "-o", tmp],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, target)  # atomic under POSIX
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    pp = ctypes.POINTER(ctypes.c_void_p)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    common = [pp, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
              ctypes.c_int64]
    lib.pack_batch_u8.argtypes = common + [ctypes.c_uint8, u8p, u8p]
    lib.pack_batch_u8.restype = ctypes.c_int
    lib.pack_batch_f32.argtypes = common + [
        ctypes.c_float, ctypes.POINTER(ctypes.c_float), u8p
    ]
    lib.pack_batch_f32.restype = ctypes.c_int
    lib.native_num_threads.argtypes = []
    lib.native_num_threads.restype = ctypes.c_int
    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.match_dets.argtypes = [
        f64p, i32p, i32p, ctypes.c_int64, ctypes.c_int64,
        f64p, ctypes.c_int64, i64p, i64p, i32p,
    ]
    lib.match_dets.restype = ctypes.c_int
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.coco_match_area.argtypes = [
        ctypes.c_int64, i64p, i64p, i64p, i64p, i64p,
        f64p, f64p, f64p, i32p, ctypes.c_double, ctypes.c_double,
        f64p, ctypes.c_int64, i8p, i8p, i64p,
    ]
    lib.coco_match_area.restype = ctypes.c_int
    return lib


def load() -> Optional[ctypes.CDLL]:
    """Return the bound library, compiling if needed; None if unavailable.

    Disable entirely with BASEDET_NO_NATIVE=1 (then all callers use their
    numpy fallbacks)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("BASEDET_NO_NATIVE"):
        return None
    try:
        target = _target_path()
        if not os.path.exists(target) and not _compile(target):
            return None
        _lib = _bind(ctypes.CDLL(target))
    except OSError:
        _lib = None
    return _lib
