"""ctypes bindings for the native host runtime (lazy-built).

Builds ``libhipac_native.so`` (libtiff tile decoder + OpenMP chunk
processor) with ``make`` on first use and caches the handle. All entry
points gate cleanly: callers fall back to pure-Python paths when the
toolchain or libtiff is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)

log = get_logger("io.native")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
# HIPAC_NATIVE_LIB overrides the .so path — the sanitizer harness
# (scripts/sanitize_native.sh) points it at the TSan/ASan builds
_LIB_PATH = os.environ.get(
    "HIPAC_NATIVE_LIB", os.path.join(_NATIVE_DIR, "libhipac_native.so")
)
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            text=True,
            timeout=300,
        )
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        log.warning("native build failed (pure-Python fallback active): %s", detail)
        return False


def get_lib() -> ctypes.CDLL | None:
    """The loaded native library, building it on first call; None if the
    native path is unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _configure(lib)
        except OSError as e:
            log.warning("cannot load native lib: %s", e)
            _build_failed = True
            return None
        except AttributeError:
            # stale .so from an older source revision (the lazy build only
            # triggers when the file is MISSING): rebuild once, else fall
            # back to pure Python rather than crashing every native caller
            log.warning("native lib is stale (missing symbol); rebuilding")
            try:
                os.remove(_LIB_PATH)
            except OSError:
                pass
            if not _build():
                _build_failed = True
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                _configure(lib)
            except (OSError, AttributeError) as e:
                log.warning("cannot load rebuilt native lib: %s", e)
                _build_failed = True
                return None
        _lib = lib
        return _lib


def _configure(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.hipac_last_error.restype = c.c_char_p
    lib.hipac_open.argtypes = [c.c_char_p]
    lib.hipac_open.restype = c.c_void_p
    lib.hipac_close.argtypes = [c.c_void_p]
    lib.hipac_level_count.argtypes = [c.c_void_p]
    lib.hipac_level_count.restype = c.c_int
    lib.hipac_level_dims.argtypes = [
        c.c_void_p, c.c_int, c.POINTER(c.c_int64), c.POINTER(c.c_int64)
    ]
    lib.hipac_level_dims.restype = c.c_int
    lib.hipac_read_region.argtypes = [
        c.c_void_p, c.c_int, c.c_int64, c.c_int64, c.c_int64, c.c_int64,
        c.POINTER(c.c_uint8),
    ]
    lib.hipac_read_region.restype = c.c_int
    lib.hipac_read_regions.argtypes = [
        c.c_void_p, c.c_int, c.POINTER(c.c_int64), c.c_int64, c.c_int64,
        c.c_int64, c.POINTER(c.c_uint8), c.c_int,
    ]
    lib.hipac_read_regions.restype = c.c_int
    lib.hipac_set_cache_bytes.argtypes = [c.c_void_p, c.c_int64]
    lib.hipac_set_cache_bytes.restype = c.c_int
    lib.hipac_cache_stats.argtypes = [
        c.c_void_p, c.POINTER(c.c_int64), c.POINTER(c.c_int64),
        c.POINTER(c.c_int64),
    ]
    lib.hipac_write_pyramid.argtypes = [
        c.c_char_p, c.POINTER(c.POINTER(c.c_uint8)), c.POINTER(c.c_int64),
        c.POINTER(c.c_int64), c.c_int, c.c_int, c.c_int,
    ]
    lib.hipac_write_pyramid.restype = c.c_int
    lib.hipac_writer_open.argtypes = [c.c_char_p, c.c_int, c.c_int]
    lib.hipac_writer_open.restype = c.c_void_p
    lib.hipac_writer_begin_level.argtypes = [
        c.c_void_p, c.c_int64, c.c_int64, c.c_int
    ]
    lib.hipac_writer_begin_level.restype = c.c_int
    lib.hipac_writer_write_band.argtypes = [
        c.c_void_p, c.c_int64, c.POINTER(c.c_uint8)
    ]
    lib.hipac_writer_write_band.restype = c.c_int
    lib.hipac_writer_end_level.argtypes = [c.c_void_p]
    lib.hipac_writer_end_level.restype = c.c_int
    lib.hipac_writer_close.argtypes = [c.c_void_p]
    lib.hipac_writer_close.restype = c.c_int
    lib.hipac_patch_means.argtypes = [
        c.POINTER(c.c_uint8), c.c_int64, c.c_int64, c.POINTER(c.c_float)
    ]
    lib.hipac_patchify.argtypes = [
        c.POINTER(c.c_uint8), c.c_int64, c.c_int64, c.c_int64,
        c.POINTER(c.c_uint8), c.POINTER(c.c_int64),
    ]
    lib.hipac_patchify.restype = c.c_int64
    lib.hipac_gather_rows.argtypes = [
        c.POINTER(c.c_uint8), c.POINTER(c.c_int64), c.c_int64, c.c_int64,
        c.POINTER(c.c_uint8),
    ]
    lib.hipac_gather_rows_s2d.argtypes = [
        c.POINTER(c.c_uint8), c.POINTER(c.c_int64), c.c_int64, c.c_int64,
        c.POINTER(c.c_uint8),
    ]
    lib.hipac_omp_max_threads.restype = ctypes.c_int


def native_available() -> bool:
    return get_lib() is not None


def last_error() -> str:
    lib = get_lib()
    if lib is None:
        return "native lib unavailable"
    return (lib.hipac_last_error() or b"").decode()


# ---------------------------------------------------------------------------
# High-level numpy wrappers (chunk processor)
# ---------------------------------------------------------------------------


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def patch_means(patches: np.ndarray) -> np.ndarray:
    """(N, ...) uint8 → (N,) float32 per-patch means (tissue statistic);
    numpy fallback when the native lib is missing."""
    patches = np.ascontiguousarray(patches, np.uint8)
    n = patches.shape[0]
    per = int(np.prod(patches.shape[1:]))
    lib = get_lib()
    if lib is None:
        return patches.reshape(n, -1).mean(axis=1, dtype=np.float64).astype(np.float32)
    out = np.empty((n,), np.float32)
    lib.hipac_patch_means(
        _u8ptr(patches), n, per, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    return out


def patchify(plane: np.ndarray, patch_size: int) -> tuple[np.ndarray, np.ndarray]:
    """(H, W, 3) uint8 → ((N, P, P, 3) patches, (N, 2) level coords) in
    reference x-major order, white pad-to-grid."""
    plane = np.ascontiguousarray(plane, np.uint8)
    h, w = plane.shape[:2]
    nx = -(-w // patch_size)
    ny = -(-h // patch_size)
    n = nx * ny
    lib = get_lib()
    patches = np.empty((n, patch_size, patch_size, 3), np.uint8)
    coords = np.empty((n, 2), np.int64)
    if lib is None:
        ph, pw = ny * patch_size, nx * patch_size
        padded = np.full((ph, pw, 3), 255, np.uint8)
        padded[:h, :w] = plane
        tiles = padded.reshape(ny, patch_size, nx, patch_size, 3)
        p = np.ascontiguousarray(
            tiles.transpose(2, 0, 1, 3, 4).reshape(n, patch_size, patch_size, 3)
        )
        c = np.empty((n, 2), np.int64)
        c[:, 0] = np.repeat(np.arange(nx, dtype=np.int64), ny) * patch_size
        c[:, 1] = np.tile(np.arange(ny, dtype=np.int64), nx) * patch_size
        return p, c
    count = lib.hipac_patchify(
        _u8ptr(plane), w, h, patch_size, _u8ptr(patches), _i64ptr(coords)
    )
    return patches[:count], coords[:count]


def gather_rows(store: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Packed-store batch gather: (N, P, P, 3)[indices] with OpenMP."""
    store = np.ascontiguousarray(store, np.uint8)
    indices = np.ascontiguousarray(indices, np.int64)
    lib = get_lib()
    if lib is None:
        return store[indices].copy()
    per = int(np.prod(store.shape[1:]))
    out = np.empty((len(indices),) + store.shape[1:], np.uint8)
    lib.hipac_gather_rows(_u8ptr(store), _i64ptr(indices), len(indices), per,
                          _u8ptr(out))
    return out


def space_to_depth_u8(imgs: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) uint8 → (B, H/2, W/2, 12) stem space-to-depth layout
    with slot order out[..., (r*2+rx)*3 + c] = in[2Y+r, 2X+rx, c]."""
    b, h, w, _ = imgs.shape
    s = imgs.reshape(b, h // 2, 2, w // 2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(s.reshape(b, h // 2, w // 2, 12))


def gather_rows_s2d(store: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Packed-store batch gather emitting the stem's space-to-depth layout
    (B, P/2, P/2, 12) directly — same bytes moved as :func:`gather_rows`,
    different addresses, so the int8 inference path skips its on-device
    transpose (measured 44.5k → 46.6k patches/s/chip)."""
    store = np.ascontiguousarray(store, np.uint8)
    indices = np.ascontiguousarray(indices, np.int64)
    patch = int(store.shape[1])
    if patch % 2 or store.shape[2] != patch or store.shape[3] != 3:
        raise ValueError(f"s2d gather needs (N, P, P, 3) with even P, "
                         f"got {store.shape}")
    lib = get_lib()
    if lib is None:
        return space_to_depth_u8(store[indices])
    out = np.empty((len(indices), patch // 2, patch // 2, 12), np.uint8)
    lib.hipac_gather_rows_s2d(
        _u8ptr(store), _i64ptr(indices), len(indices), patch, _u8ptr(out)
    )
    return out
