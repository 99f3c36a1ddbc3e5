"""Native (C++) runtime components, loaded via ctypes.

Built on demand from native/*.cpp with g++ (`make native` or automatic
first-use build). Every consumer has a pure scipy/numpy fallback so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import sys
from pathlib import Path

logger = logging.getLogger(__name__)

_PKG_DIR = Path(__file__).resolve().parent
_SRC_DIR = _PKG_DIR.parent.parent / "native"
_LIB_PATH = _PKG_DIR / "libboa_native.so"

_lib: ctypes.CDLL | None = None
_load_attempted = False


def _build() -> bool:
    srcs = sorted(_SRC_DIR.glob("*.cpp"))
    if not srcs:
        return False
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", str(_LIB_PATH)]
    cmd += [str(s) for s in srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        logger.warning("native build failed (%s); using pure-python fallbacks", e)
        return False


def _newer_than_lib() -> bool:
    if not _LIB_PATH.exists():
        return True
    lib_mtime = _LIB_PATH.stat().st_mtime
    return any(s.stat().st_mtime > lib_mtime for s in _SRC_DIR.glob("*.cpp"))


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None:
        return _lib
    if _load_attempted:
        return None
    _load_attempted = True
    try:
        if _SRC_DIR.exists() and _newer_than_lib():
            if not _build() and not _LIB_PATH.exists():
                return None
        if not _LIB_PATH.exists():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        dims = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.boa_label3d.restype = ctypes.c_int32
        lib.boa_label3d.argtypes = [ctypes.c_void_p, *dims, ctypes.c_int,
                                    ctypes.c_void_p]
        lib.boa_largest_component.restype = ctypes.c_int32
        lib.boa_largest_component.argtypes = [ctypes.c_void_p, *dims,
                                              ctypes.c_int, ctypes.c_void_p]
        lib.boa_filter_components_by_size.restype = ctypes.c_int32
        lib.boa_filter_components_by_size.argtypes = [
            ctypes.c_void_p, *dims, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_void_p,
        ]
        lib.boa_component_sizes.restype = None
        lib.boa_component_sizes.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p]
        if hasattr(lib, "boa_histogram_u8"):
            lib.boa_histogram_u8.restype = None
            lib.boa_histogram_u8.argtypes = [ctypes.c_void_p,
                                             ctypes.c_int64,
                                             ctypes.c_void_p]
        if hasattr(lib, "boa_keep_largest_lut"):  # absent in stale builds
            lib.boa_keep_largest_lut.restype = ctypes.c_int32
            lib.boa_keep_largest_lut.argtypes = [ctypes.c_void_p, *dims,
                                                 ctypes.c_void_p,
                                                 ctypes.c_int,
                                                 ctypes.c_uint8]
        for name in ("boa_pack4_axis0", "boa_unpack4_axis0"):
            if hasattr(lib, name):
                fn = getattr(lib, name)
                fn.restype = None
                fn.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_void_p]
        if hasattr(lib, "boa_pack12_axis0"):
            lib.boa_pack12_axis0.restype = None
            lib.boa_pack12_axis0.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                             ctypes.c_int64, ctypes.c_void_p]
            if hasattr(lib, "boa_pack12_axis0_checked"):
                lib.boa_pack12_axis0_checked.restype = ctypes.c_int32
                lib.boa_pack12_axis0_checked.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_void_p]
            lib.boa_unpack12_axis0.restype = None
            lib.boa_unpack12_axis0.argtypes = [ctypes.c_void_p,
                                               ctypes.c_int64,
                                               ctypes.c_int64, ctypes.c_void_p]
        for name in ("boa_xordelta_enc_u8", "boa_xordelta_dec_u8"):
            if hasattr(lib, name):
                fn = getattr(lib, name)
                fn.restype = None
                fn.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_int64, ctypes.c_void_p]
        for name in ("boa_minmax_i16", "boa_minmax_f32"):
            if hasattr(lib, name):
                fn = getattr(lib, name)
                fn.restype = None
                fn.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_void_p, ctypes.c_void_p]
        if hasattr(lib, "boa_label_z_presence"):
            lib.boa_label_z_presence.restype = None
            lib.boa_label_z_presence.argtypes = [
                ctypes.c_void_p, *dims, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p]
        if hasattr(lib, "boa_subclassify_lut"):
            lib.boa_subclassify_lut.restype = None
            lib.boa_subclassify_lut.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p]
        if hasattr(lib, "boa_parts_postprocess_label"):
            lib.boa_parts_postprocess_label.restype = ctypes.c_int64
            lib.boa_parts_postprocess_label.argtypes = [
                ctypes.c_void_p, *dims, ctypes.c_uint8,
                *([ctypes.c_int64] * 6), ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
        return _lib
    except OSError as e:
        logger.warning("could not load native lib: %s", e)
        return None
