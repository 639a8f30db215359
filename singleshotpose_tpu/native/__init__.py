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
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ssp_synth_masked_resize.restype = None
        lib.ssp_synth_masked_resize.argtypes = [
            u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, u8p, u8p,
            ctypes.c_int, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long)]
        lib.ssp_synth_composite.restype = None
        lib.ssp_synth_composite.argtypes = [u8p, u8p, u8p, u8p, ctypes.c_long]
        lib.ssp_change_background_buf.restype = None
        lib.ssp_change_background_buf.argtypes = [
            u8p, u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
            ctypes.c_int]
        _lib = lib
        return _lib


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class NativeSynthOps:
    """Fused pixel core for multi-object scene synthesis.

    Bit-exact vs the numpy ops in ``data/synth_multi.py`` (same f32 formulas
    and truncation; crop/resize/roll/flip fold into one gather and the
    foreground product commutes with selection).  All RNG draws stay in
    Python, so enabling this path is draw-identical to the numpy path.
    ctypes releases the GIL during calls — loader worker threads scale.
    """

    def __init__(self):
        self.lib = load_native()
        if self.lib is None:
            raise RuntimeError("native synth ops unavailable (g++ build)")

    def masked_resize(self, img: np.ndarray, mask: np.ndarray, pleft: int,
                      ptop: int, cw: int, ch: int, out_w: int, out_h: int,
                      shift_x: int = 0, shift_y: int = 0, flip: bool = False,
                      total: Optional[np.ndarray] = None, thresh: int = 200):
        """(masked_sized, mask_sized[, area, inter]) — fused
        ``mask_foreground`` + ``crop_resize`` (+ roll/flip) of image AND
        mask; with ``total`` also the rejection-test overlap counts."""
        img = np.ascontiguousarray(img, np.uint8)
        mask = np.ascontiguousarray(mask, np.uint8)
        h, w = img.shape[:2]
        if mask.shape[:2] != (h, w):
            # the C kernel indexes mask with the image's strides; a
            # mismatched mask would read out of bounds silently
            raise ValueError(f"mask shape {mask.shape[:2]} != image {(h, w)}")
        msized = np.empty((out_h, out_w, 3), np.uint8)
        ksized = np.empty((out_h, out_w, 3), np.uint8)
        area = ctypes.c_long()
        inter = ctypes.c_long()
        tp = _u8p(total) if total is not None else None
        self.lib.ssp_synth_masked_resize(
            _u8p(img), _u8p(mask), h, w, pleft, ptop, cw, ch,
            shift_x, shift_y, int(flip), out_w, out_h,
            _u8p(msized), _u8p(ksized), tp, thresh,
            ctypes.byref(area), ctypes.byref(inter))
        if total is None:
            return msized, ksized
        return msized, ksized, int(area.value), int(inter.value)

    def composite(self, fg: np.ndarray, mask: np.ndarray, canvas: np.ndarray,
                  total: Optional[np.ndarray] = None) -> None:
        """In place: ``superimpose`` into canvas (+ ``superimpose_masks``
        into total when given)."""
        if not (fg.shape == mask.shape == canvas.shape and
                (total is None or total.shape == fg.shape)):
            raise ValueError("composite operands must share one shape")
        self.lib.ssp_synth_composite(
            _u8p(fg), _u8p(mask), _u8p(canvas),
            _u8p(total) if total is not None else None, fg.size)

    def change_background(self, canvas: np.ndarray, mask: np.ndarray,
                          bg: np.ndarray) -> None:
        """In place: ``augment.change_background`` on decoded buffers."""
        if mask.shape != canvas.shape:
            raise ValueError(f"mask shape {mask.shape} != canvas "
                             f"{canvas.shape}")
        bg = np.ascontiguousarray(bg, np.uint8)
        self.lib.ssp_change_background_buf(
            _u8p(canvas), _u8p(mask), canvas.shape[0], canvas.shape[1],
            _u8p(bg), bg.shape[0], bg.shape[1])


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
