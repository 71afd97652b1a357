"""ctypes bindings for the native host sampler (posegen_tpu/csrc/host_sampler.cpp).

The C++ library does the data loader's hot per-image loop (mask scan, pixel
draw, ray construction + pixel gather) in one pass. Loading is lazy and
optional: `get_lib()` auto-compiles the packaged source with g++ on first
use (into posegen_tpu/lib/, or ~/.cache/posegen_tpu when the install is
read-only) and returns None when no compiler is available, in which case
callers fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC_PATH = os.path.join(_PKG_DIR, "csrc", "host_sampler.cpp")
_LIB_PATH = os.path.join(_PKG_DIR, "lib", "libposegen_host.so")
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _src_tag() -> Optional[str]:
    """Content hash of the packaged source; keys the user-cache .so so a
    package upgrade can never load a stale cached binary."""
    try:
        import hashlib

        with open(_SRC_PATH, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None


def _cache_lib_path() -> str:
    tag = _src_tag() or "unknown"
    return os.path.join(
        os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
        "posegen_tpu",
        f"libposegen_host-{tag}.so",
    )

_I64P = ctypes.POINTER(ctypes.c_int64)
_U8P = ctypes.POINTER(ctypes.c_uint8)
_F32P = ctypes.POINTER(ctypes.c_float)


def _compile(out_path: str) -> bool:
    try:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC_PATH, "-o", out_path],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def build_lib() -> Optional[str]:
    """Compile the packaged source with g++; returns the .so path on success.

    Prefers the in-package lib/ dir (repo checkouts, editable installs);
    falls back to the user cache dir when the package dir is not writable
    (system wheel installs). The cache filename embeds the source hash.
    """
    if not os.path.exists(_SRC_PATH):
        return None
    for path in (_LIB_PATH, _cache_lib_path()):
        if _compile(path):
            return path
    return None


def _is_stale(lib_path: str) -> bool:
    """In-package .so older than the packaged source → rebuild."""
    try:
        return os.path.getmtime(lib_path) < os.path.getmtime(_SRC_PATH)
    except OSError:
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare the exported symbols; raises AttributeError on a lib built
    from an older source revision that lacks one."""
    lib.pg_sample_pixels.restype = ctypes.c_int64
    lib.pg_sample_pixels.argtypes = [
        _U8P, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, _I64P, _I64P,
    ]
    lib.pg_gather_rays.restype = None
    lib.pg_gather_rays.argtypes = [
        _I64P, ctypes.c_int64, _U8P, _U8P, _U8P, _F32P, _F32P,
        ctypes.c_float, ctypes.c_float,
        _F32P, _F32P, _F32P, _F32P, _F32P,
    ]
    _U64P = ctypes.POINTER(ctypes.c_uint64)
    lib.pg_assemble_batch.restype = None
    lib.pg_assemble_batch.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _U64P, _U64P, _U64P, _U64P, _U64P, _I64P,
        _F32P, _F32P, _F32P, _F32P,
        ctypes.c_uint64, _I64P,
        _F32P, _F32P, _F32P, _F32P, _F32P, _I64P,
    ]
    return lib


def get_lib(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None:
        return _lib
    if _load_attempted:
        return None
    _load_attempted = True
    candidates = [
        p
        for p in (_LIB_PATH, _cache_lib_path())
        if os.path.exists(p) and not _is_stale(p)
    ]
    lib_path = candidates[0] if candidates else None
    if lib_path is None and auto_build:
        lib_path = build_lib()
    if lib_path is None:
        return None
    try:
        _lib = _bind(ctypes.CDLL(lib_path))
    except (OSError, AttributeError):
        # stale or broken binary (e.g. an old fixed-name .so missing a newer
        # symbol): rebuild from the packaged source once, else fall back to
        # the numpy path instead of crashing the loader
        _lib = None
        if auto_build:
            rebuilt = build_lib()
            if rebuilt is not None:
                try:
                    _lib = _bind(ctypes.CDLL(rebuilt))
                except (OSError, AttributeError):
                    _lib = None
    return _lib


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


def sample_and_gather(
    smask: np.ndarray,  # (H*W,) uint8 sampling mask
    img: np.ndarray,  # (H*W, 3) uint8
    mask: np.ndarray,  # (H*W,) uint8 fg mask
    pix_dirs: np.ndarray,  # (H*W, 3) f32 pre-focal camera dirs
    c2w: np.ndarray,  # (4, 4) or (3, 4) f32
    fx: float,
    fy: float,
    n_rays: int,
    seed: int,
    bkgd: Optional[np.ndarray] = None,  # (H*W, 3) uint8
) -> Optional[Dict[str, np.ndarray]]:
    """One-call native sample_image core; None if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    n_pixels = smask.shape[0]
    smask = np.ascontiguousarray(smask, np.uint8)
    img = np.ascontiguousarray(img, np.uint8)
    mask = np.ascontiguousarray(mask, np.uint8)
    pix_dirs = np.ascontiguousarray(pix_dirs, np.float32)
    c2w34 = np.ascontiguousarray(np.asarray(c2w, np.float32)[:3, :4])

    scratch = np.empty(n_pixels, np.int64)
    idx = np.empty(n_rays, np.int64)
    lib.pg_sample_pixels(
        _ptr(smask, _U8P), n_pixels, n_rays, np.uint64(seed),
        _ptr(scratch, _I64P), _ptr(idx, _I64P),
    )

    rays_o = np.empty((n_rays, 3), np.float32)
    rays_d = np.empty((n_rays, 3), np.float32)
    target = np.empty((n_rays, 3), np.float32)
    fg = np.empty((n_rays, 1), np.float32)
    bg = np.empty((n_rays, 3), np.float32)
    bk = (
        np.ascontiguousarray(bkgd, np.uint8)
        if bkgd is not None
        else None
    )
    lib.pg_gather_rays(
        _ptr(idx, _I64P), n_rays,
        _ptr(img, _U8P), _ptr(mask, _U8P),
        _ptr(bk, _U8P) if bk is not None else None,
        _ptr(pix_dirs, _F32P), _ptr(c2w34, _F32P),
        ctypes.c_float(fx), ctypes.c_float(fy),
        _ptr(rays_o, _F32P), _ptr(rays_d, _F32P),
        _ptr(target, _F32P), _ptr(fg, _F32P), _ptr(bg, _F32P),
    )
    return {
        "idx": idx, "rays_o": rays_o, "rays_d": rays_d,
        "target_s": target, "fgs": fg, "bgs": bg,
    }


_U64P = ctypes.POINTER(ctypes.c_uint64)


def assemble_batch(
    img_addr: np.ndarray,  # (G,) uint64 per-image base pointers
    mask_addr: np.ndarray,  # (G,) uint64 fg masks
    smask_addr: np.ndarray,  # (G,) uint64 sampling masks
    bkgd_addr: Optional[np.ndarray],  # (G,) uint64 or None
    valid_addr: Optional[np.ndarray],  # (G,) uint64 int32 idx lists or None
    valid_cnt: Optional[np.ndarray],  # (G,) int64
    pix_dirs: np.ndarray,  # (H*W, 3) f32
    c2ws: np.ndarray,  # (G, 12) f32
    fx: np.ndarray,  # (G,) f32
    fy: np.ndarray,  # (G,) f32
    n_pixels: int,
    n_rays: int,
    seed: int,
) -> Optional[Dict[str, np.ndarray]]:
    """Whole-batch sample+gather over mmapped images; None if lib missing.

    The addr arrays hold raw base pointers (np.memmap slices); the caller
    must keep the owning buffers alive across the call."""
    lib = get_lib()
    if lib is None:
        return None
    g = int(img_addr.shape[0])
    n = g * n_rays
    img_addr = np.ascontiguousarray(img_addr, np.uint64)
    mask_addr = np.ascontiguousarray(mask_addr, np.uint64)
    smask_addr = np.ascontiguousarray(smask_addr, np.uint64)
    pix_dirs = np.ascontiguousarray(pix_dirs, np.float32)
    c2ws = np.ascontiguousarray(c2ws, np.float32)
    fx = np.ascontiguousarray(fx, np.float32)
    fy = np.ascontiguousarray(fy, np.float32)
    scratch = np.empty(n_pixels, np.int64)
    rays_o = np.empty((n, 3), np.float32)
    rays_d = np.empty((n, 3), np.float32)
    target = np.empty((n, 3), np.float32)
    fg = np.empty((n, 1), np.float32)
    bg = np.empty((n, 3), np.float32)
    idx = np.empty(n, np.int64)
    # keep the address arrays alive in locals across the call (a bare
    # _ptr(temporary) would let the GC free the buffer mid-call)
    bk_arr = (
        np.ascontiguousarray(bkgd_addr, np.uint64) if bkgd_addr is not None else None
    )
    va_arr = (
        np.ascontiguousarray(valid_addr, np.uint64) if valid_addr is not None else None
    )
    vc_arr = (
        np.ascontiguousarray(valid_cnt, np.int64) if valid_cnt is not None else None
    )
    bk = _ptr(bk_arr, _U64P) if bk_arr is not None else None
    va = _ptr(va_arr, _U64P) if va_arr is not None else None
    vc = _ptr(vc_arr, _I64P) if vc_arr is not None else None
    lib.pg_assemble_batch(
        g, n_rays, n_pixels,
        _ptr(img_addr, _U64P), _ptr(mask_addr, _U64P), _ptr(smask_addr, _U64P),
        bk, va, vc,
        _ptr(pix_dirs, _F32P), _ptr(c2ws, _F32P),
        _ptr(fx, _F32P), _ptr(fy, _F32P),
        np.uint64(seed), _ptr(scratch, _I64P),
        _ptr(rays_o, _F32P), _ptr(rays_d, _F32P),
        _ptr(target, _F32P), _ptr(fg, _F32P), _ptr(bg, _F32P),
        _ptr(idx, _I64P),
    )
    return {
        "idx": idx, "rays_o": rays_o, "rays_d": rays_d,
        "target_s": target, "fgs": fg, "bgs": bg,
    }
