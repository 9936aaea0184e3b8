"""Build and load the native RLE codec (csrc/rle.cpp) via ctypes.

The shared library is compiled on first import with g++ -O3 and cached next
to the source; recompiled whenever the source is newer than the cached .so.
Set AMPIS_TPU_NO_NATIVE=1 to skip the native codec (a pure-numpy fallback in
``ampis_tpu.rle`` is used instead).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import tempfile
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "csrc" / "rle.cpp"


def _build_dir() -> Path:
    d = _REPO_ROOT / "build"
    try:
        d.mkdir(exist_ok=True)
        return d
    except OSError:
        return Path(tempfile.gettempdir())


def _compile() -> Path | None:
    if not _SRC.exists():
        return None
    so = _build_dir() / "librle.so"
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    tmp = so.with_suffix(f".{os.getpid()}.tmp.so")
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", str(_SRC), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, so)
        return so
    except (subprocess.CalledProcessError, OSError):
        # retry without -march=native (portability)
        try:
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            os.replace(tmp, so)
            return so
        except (subprocess.CalledProcessError, OSError, ValueError):
            return None


def load() -> ctypes.CDLL | None:
    if os.environ.get("AMPIS_TPU_NO_NATIVE") == "1":
        return None
    so = _compile()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    c = ctypes
    u8p = c.POINTER(c.c_uint8)
    u32p = c.POINTER(c.c_uint32)
    u64p = c.POINTER(c.c_uint64)
    f64p = c.POINTER(c.c_double)
    f32p = c.POINTER(c.c_float)
    i32p = c.POINTER(c.c_int32)

    lib.rle_buf_free.argtypes = [c.c_void_p]
    lib.rle_buf_free.restype = None

    lib.rle_from_string.argtypes = [c.c_char_p, c.c_uint64, u32p]
    lib.rle_from_string.restype = c.c_uint64

    lib.rle_to_string.argtypes = [u32p, c.c_uint64, c.c_char_p]
    lib.rle_to_string.restype = c.c_uint64

    lib.rle_encode_batch.argtypes = [
        u8p, c.c_uint64, c.c_uint64, c.c_uint64, u64p, u64p, c.c_int]
    lib.rle_encode_batch.restype = c.c_void_p

    lib.rle_decode_batch.argtypes = [
        u32p, u64p, u64p, c.c_uint64, c.c_uint64, c.c_uint64, u8p, c.c_int]
    lib.rle_decode_batch.restype = None

    lib.rle_area_batch.argtypes = [u32p, u64p, u64p, c.c_uint64, u64p, c.c_int]
    lib.rle_area_batch.restype = None

    lib.rle_to_bbox_batch.argtypes = [
        u32p, u64p, u64p, c.c_uint64, c.c_uint64, c.c_uint64, f64p, c.c_int]
    lib.rle_to_bbox_batch.restype = None

    lib.rle_merge_many.argtypes = [u32p, u64p, u64p, c.c_uint64, c.c_int, u64p]
    lib.rle_merge_many.restype = c.c_void_p

    lib.rle_intersect_area_batch.argtypes = [
        u32p, c.c_uint64, u32p, u64p, u64p, c.c_uint64, u64p, c.c_int]
    lib.rle_intersect_area_batch.restype = None

    lib.rle_iou_batch.argtypes = [
        u32p, u64p, u64p, c.c_uint64,
        u32p, u64p, u64p, c.c_uint64,
        c.c_uint64, c.c_uint64, u8p, f64p, c.c_int]
    lib.rle_iou_batch.restype = None

    lib.rle_fr_poly.argtypes = [f64p, c.c_uint64, c.c_uint64, c.c_uint64, u64p]
    lib.rle_fr_poly.restype = c.c_void_p

    lib.cc_label.argtypes = [u8p, c.c_uint64, c.c_uint64, i32p]
    lib.cc_label.restype = c.c_int64

    lib.paste_masks_encode.argtypes = [
        f32p, f32p, c.c_uint64, c.c_uint64, c.c_uint64, c.c_uint64, c.c_uint64,
        c.c_float, u64p, u64p, c.c_int]
    lib.paste_masks_encode.restype = c.c_void_p

    return lib


LIB = load()
