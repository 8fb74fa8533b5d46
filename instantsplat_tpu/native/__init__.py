"""Native (C++) runtime components, loaded via ctypes.

The TPU compute path is JAX/Pallas; the host-side runtime around it uses
native code where the reference does (the reference decodes images/EXRs
through OpenCV's C++ imgcodecs — dust3r/utils/image.py:imread_cv2). Build
strategy: the C++ sources in this directory are compiled once with the
system toolchain into a cached shared library (no pip/pybind11 in this
environment; the ABI is plain C for ctypes). Every native entry point has
a pure-Python fallback, so the framework works — just slower on the data
path — when no compiler is available.

Public API:
  get_lib() -> ctypes.CDLL | None    (compiles on first use, then cached)
  exr_decode_blocks(...)             thin typed wrapper; raises on error
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_log = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "exr_native.cpp"
_ABI = 1
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _cache_dir() -> Path:
    d = os.environ.get("INSTANTSPLAT_NATIVE_CACHE")
    if d:
        return Path(d)
    return Path.home() / ".cache" / "instantsplat_tpu_native"


def build_lib() -> Path:
    """Compile the native library (cached by source hash). Raises on
    compiler failure."""
    src = _SRC.read_bytes()
    key = hashlib.sha1(src).hexdigest()[:16]
    out = _cache_dir() / f"instantsplat_native_{key}.so"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(f".build{os.getpid()}.so")
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-shared", "-fPIC",
        "-std=c++17", str(_SRC), "-o", str(tmp), "-lz", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, out)  # atomic vs concurrent builders
    return out


def get_lib():
    """Load (building if needed) the native library; None when unavailable.

    Disable explicitly with INSTANTSPLAT_NO_NATIVE=1 (tests use this to
    exercise the pure-Python fallbacks)."""
    global _lib, _lib_failed
    if os.environ.get("INSTANTSPLAT_NO_NATIVE"):
        return None
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            lib = ctypes.CDLL(str(build_lib()))
            if lib.exr_native_abi() != _ABI:
                raise RuntimeError("native ABI mismatch; rebuild")
            lib.exr_decode_blocks.restype = ctypes.c_int
            lib.exr_decode_blocks.argtypes = [
                ctypes.c_char_p,                  # buf
                ctypes.c_int64,                   # buf_len
                ctypes.c_int64,                   # first_block_off
                ctypes.c_int32,                   # n_blocks
                ctypes.c_int32,                   # lpb
                ctypes.c_int32,                   # compressed
                ctypes.c_int32,                   # width
                ctypes.c_int32,                   # height
                ctypes.c_int32,                   # y0
                ctypes.c_int32,                   # n_channels
                ctypes.POINTER(ctypes.c_int32),   # pix_sz
                ctypes.POINTER(ctypes.c_void_p),  # planes
                ctypes.c_int32,                   # n_threads
            ]
            _lib = lib
        except Exception as e:  # no compiler / bad toolchain -> fallback
            _lib_failed = True
            _log.warning("native library unavailable (%s); using the "
                         "pure-Python data-path fallbacks", e)
        return _lib


def exr_decode_blocks(buf: bytes, first_block_off: int, n_blocks: int,
                      lpb: int, compressed: bool, width: int, height: int,
                      y0: int, pix_sz: list[int], planes: list[np.ndarray],
                      n_threads: int = 0) -> None:
    """Decode an EXR's scanline blocks into preallocated channel planes.

    planes[c] must be C-contiguous with itemsize pix_sz[c] and shape
    [height, width]. Raises RuntimeError on malformed input."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    for p, s in zip(planes, pix_sz):
        # explicit raise, not assert: the C side trusts these (a violation
        # would be an out-of-bounds native write), so the check must
        # survive python -O
        if not (p.flags.c_contiguous and p.itemsize == s
                and p.shape == (height, width)):
            raise ValueError(
                f"plane must be C-contiguous [{height}, {width}] with "
                f"itemsize {s}; got shape {p.shape}, itemsize {p.itemsize}, "
                f"contiguous={p.flags.c_contiguous}")
    sz = (ctypes.c_int32 * len(pix_sz))(*pix_sz)
    ptrs = (ctypes.c_void_p * len(planes))(
        *[p.ctypes.data_as(ctypes.c_void_p).value for p in planes])
    rc = lib.exr_decode_blocks(
        buf, len(buf), first_block_off, n_blocks, lpb, int(compressed),
        width, height, y0, len(planes), sz, ptrs, n_threads)
    if rc != 0:
        msgs = {1: "bad block framing", 2: "zlib error", 3: "short block"}
        raise RuntimeError(f"EXR decode failed: {msgs.get(rc, rc)}")
