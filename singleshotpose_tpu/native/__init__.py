"""ctypes binding for the native data-loader core (``ssp_native.cpp``).

Builds ``libssp_native.so`` on first use with g++ (cached next to the
source); every entry point degrades to the pure-Python path if the toolchain
or image libraries are unavailable, so the framework never hard-requires the
native component.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

__all__ = ["load_native", "native_available", "NativeLoader"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ssp_native.cpp")
_SO = os.path.join(_HERE, "libssp_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC,
           "-o", _SO, "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.ssp_decode_rgb.restype = ctypes.c_int
        lib.ssp_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.ssp_train_sample.restype = ctypes.c_int
        lib.ssp_train_batch.restype = None
        lib.ssp_test_batch.restype = None
        lib.ssp_bg_cache_limit.restype = None
        lib.ssp_bg_cache_limit.argtypes = [ctypes.c_long]
        lib.ssp_bg_cache_clear.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_native() is not None


def _cstr_array(paths: Sequence[Optional[str]]):
    arr = (ctypes.c_char_p * len(paths))()
    for i, p in enumerate(paths):
        arr[i] = p.encode() if p is not None else None
    return arr


class NativeLoader:
    """Batch decode/augment via the native thread pool."""

    def __init__(self, nthreads: int = 0):
        self.lib = load_native()
        if self.lib is None:
            raise RuntimeError("native loader unavailable (g++/libjpeg/libpng)")
        self.nthreads = nthreads

    def set_bg_cache_limit(self, nbytes: int) -> None:
        """Cap (and flush) the process-wide background-image LRU cache.

        The train path decodes one random VOC background per sample; repeats
        hit the cache instead.  Default 1 GiB; 0 disables caching.  Large
        sources are decoded at DCT scale toward the compositing dims
        (libjpeg ``scale_denom``) before caching.
        """
        self.lib.ssp_bg_cache_limit(ctypes.c_long(nbytes))

    def clear_bg_cache(self) -> None:
        self.lib.ssp_bg_cache_clear()

    def decode(self, path: str) -> np.ndarray:
        """Decode one image to RGB uint8 (H,W,3)."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        cap = 16 * 1024 * 1024
        buf = np.empty(cap, np.uint8)
        rc = self.lib.ssp_decode_rgb(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap, ctypes.byref(w), ctypes.byref(h))
        if rc == -2:
            cap = w.value * h.value * 3
            buf = np.empty(cap, np.uint8)
            rc = self.lib.ssp_decode_rgb(
                path.encode(),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
                ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            raise IOError(f"decode failed ({rc}): {path}")
        return buf[:w.value * h.value * 3].reshape(h.value, w.value, 3).copy()

    def train_batch(self, imgpaths: Sequence[str],
                    maskpaths: Sequence[Optional[str]],
                    bgpaths: Sequence[Optional[str]],
                    crops: np.ndarray, hsv: np.ndarray,
                    out_w: int, out_h: int) -> np.ndarray:
        """Fused decode+composite+crop+HSV for a batch.

        crops: int32 (n,4) [pleft, ptop, cropw, croph]; hsv: float32 (n,3)
        [dhue, dsat, dexp].  Returns float32 (n, out_h, out_w, 3) in [0,1].
        """
        n = len(imgpaths)
        out = np.empty((n, out_h, out_w, 3), np.float32)
        status = np.zeros(n, np.int32)
        crops = np.ascontiguousarray(crops, np.int32)
        hsv = np.ascontiguousarray(hsv, np.float32)
        self.lib.ssp_train_batch(
            ctypes.c_int(n), _cstr_array(list(imgpaths)),
            _cstr_array(list(maskpaths)), _cstr_array(list(bgpaths)),
            crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            hsv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(out_w), ctypes.c_int(out_h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(self.nthreads))
        bad = np.nonzero(status)[0]
        if bad.size:
            raise IOError(
                f"native train batch failed for {[imgpaths[i] for i in bad]}"
                f" (codes {status[bad].tolist()})")
        return out

    def train_batch_u8(self, imgpaths: Sequence[str],
                       maskpaths: Sequence[Optional[str]],
                       bgpaths: Sequence[Optional[str]],
                       crops: np.ndarray, hsv: np.ndarray,
                       out_w: int, out_h: int) -> np.ndarray:
        """uint8 variant of :meth:`train_batch` — 1/4 the host→device bytes;
        the device's ``u8/255`` equals the f32 path bit-exactly."""
        n = len(imgpaths)
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        status = np.zeros(n, np.int32)
        crops = np.ascontiguousarray(crops, np.int32)
        hsv = np.ascontiguousarray(hsv, np.float32)
        self.lib.ssp_train_batch_u8(
            ctypes.c_int(n), _cstr_array(list(imgpaths)),
            _cstr_array(list(maskpaths)), _cstr_array(list(bgpaths)),
            crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            hsv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(out_w), ctypes.c_int(out_h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(self.nthreads))
        bad = np.nonzero(status)[0]
        if bad.size:
            raise IOError(
                f"native train batch failed for {[imgpaths[i] for i in bad]}"
                f" (codes {status[bad].tolist()})")
        return out

    def test_batch_u8(self, imgpaths: Sequence[str], out_w: int,
                      out_h: int) -> np.ndarray:
        """Decode+resize only, uint8 out — 4x lighter host→device transfer."""
        n = len(imgpaths)
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        status = np.zeros(n, np.int32)
        self.lib.ssp_test_batch_u8(
            ctypes.c_int(n), _cstr_array(list(imgpaths)),
            ctypes.c_int(out_w), ctypes.c_int(out_h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(self.nthreads))
        bad = np.nonzero(status)[0]
        if bad.size:
            raise IOError(
                f"native test batch failed for {[imgpaths[i] for i in bad]}")
        return out

    def image_dims(self, path: str):
        """(width, height) from the header only (no pixel decode)."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self.lib.ssp_image_dims(path.encode(), ctypes.byref(w),
                                     ctypes.byref(h))
        if rc != 0:
            raise IOError(f"cannot read image dims: {path}")
        return w.value, h.value

    def test_batch_yuv420(self, imgpaths: Sequence[str]):
        """Decode a batch to native-resolution YUV 4:2:0 planes.

        Returns (y (n,H,W) u8, cbcr (n,H/2,W/2,2) u8) — 1.5 bytes/px, the
        transfer-optimal eval input (JPEG's own colorspace; the device
        upsamples chroma, applies the BT.601 matrix, and nearest-resizes,
        see ``ops/yuv.py``).  All images must share one native size.
        """
        n = len(imgpaths)
        w, h = self.image_dims(imgpaths[0])
        y = np.empty((n, h, w), np.uint8)
        cbcr = np.empty((n, h // 2, w // 2, 2), np.uint8)
        status = np.zeros(n, np.int32)
        self.lib.ssp_test_batch_yuv420(
            ctypes.c_int(n), _cstr_array(list(imgpaths)),
            ctypes.c_int(w), ctypes.c_int(h),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cbcr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(self.nthreads))
        bad = np.nonzero(status)[0]
        if bad.size:
            raise IOError(
                f"native yuv420 batch failed for "
                f"{[imgpaths[i] for i in bad]} (codes {status[bad].tolist()})")
        return y, cbcr

    def test_batch(self, imgpaths: Sequence[str], out_w: int,
                   out_h: int) -> np.ndarray:
        n = len(imgpaths)
        out = np.empty((n, out_h, out_w, 3), np.float32)
        status = np.zeros(n, np.int32)
        self.lib.ssp_test_batch(
            ctypes.c_int(n), _cstr_array(list(imgpaths)),
            ctypes.c_int(out_w), ctypes.c_int(out_h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(self.nthreads))
        bad = np.nonzero(status)[0]
        if bad.size:
            raise IOError(
                f"native test batch failed for {[imgpaths[i] for i in bad]}")
        return out
