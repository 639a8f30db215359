"""On-device YUV 4:2:0 → RGB → resized eval input.

Transfer-optimal eval feeding: JPEG stores YCbCr with 2×2-subsampled chroma,
so shipping Y (H,W) + CbCr (H/2,W/2,2) uint8 planes to the device carries
1.5 bytes/px at NATIVE resolution instead of 3 bytes/px at the (usually
larger) eval resolution — ≥2.9× fewer bytes over a bandwidth-limited
host↔device link (the reference instead ships full f32 RGB at eval size,
``valid.py:107``: 8× more).  The device then does, in one jitted program:

  1. chroma upsample ×2 (``jnp.repeat`` — a broadcast-reshape, no gather),
  2. full-range BT.601 matrix (the JFIF constants libjpeg uses),
  3. center-sample nearest resize to the eval shape via one-hot selection
     matmuls on the MXU (TPU dynamic gathers serialize; 0/1 matmuls don't —
     same trick as ``data/device_augment._crop_resize_one``),
  4. normalize to [0,1] float32.

Numerics: the chroma round-trip (libjpeg upsample → 2×2 box re-subsample →
nearest upsample) differs from direct RGB decode by ≲2 u8 levels in smooth
regions — quantified in tests/test_yuv.py; the default eval path remains
RGB, YUV420 is opt-in (``run_validation(transfer="yuv420")``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["yuv420_to_rgb_resized"]


def _nearest_resize_static(img, out_h: int, out_w: int):
    """Center-sample nearest resize with static shapes, batched NHWC.

    Same index math as ``augment.resize_nearest`` (bit-identical picks); the
    one-hot selection matrices are compile-time constants, so XLA folds them
    and the resample runs as two MXU matmuls.
    """
    ih, iw = img.shape[1], img.shape[2]
    if (ih, iw) == (out_h, out_w):
        return img
    yi = jnp.minimum(((jnp.arange(out_h) + 0.5) * ih / out_h).astype(jnp.int32),
                     ih - 1)
    xi = jnp.minimum(((jnp.arange(out_w) + 0.5) * iw / out_w).astype(jnp.int32),
                     iw - 1)
    sel_y = jax.nn.one_hot(yi, ih, dtype=img.dtype)      # (out_h, ih)
    sel_x = jax.nn.one_hot(xi, iw, dtype=img.dtype)      # (out_w, iw)
    rows = jnp.einsum("oi,biwc->bowc", sel_y, img,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,bowc->bopc", sel_x, rows,
                      precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("out_w", "out_h"))
def yuv420_to_rgb_resized(y: jax.Array, cbcr: jax.Array, *, out_w: int,
                          out_h: int) -> jax.Array:
    """(B,H,W) u8 luma + (B,H/2,W/2,2) u8 chroma → (B,out_h,out_w,3) f32 [0,1].
    """
    B, H, W = y.shape
    yf = y.astype(jnp.float32)
    c = cbcr.astype(jnp.float32) - 128.0
    # nearest ×2 chroma upsample: repeat is a broadcast-reshape on TPU
    c = jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)[:, :H, :W]
    cb, cr = c[..., 0], c[..., 1]
    # full-range BT.601 (JFIF) — what libjpeg's YCbCr→RGB uses
    r = yf + 1.402 * cr
    g = yf - 0.344136286 * cb - 0.714136286 * cr
    b = yf + 1.772 * cb
    rgb = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)
    out = _nearest_resize_static(rgb, out_h, out_w)
    return out / 255.0
