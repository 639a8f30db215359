"""On-device (TPU) batch augmentation — the compute half of the train
pipeline moved off the host.

The reference does all augmentation in PIL on DataLoader workers
(reference: ``image.py:46-127``).  The host then only has to decode
images/masks; compositing, crop-jitter, resize, and HSV distortion run as
one jitted XLA program over the whole batch:

  host: decode img+mask+bg at native size  →  device: composite → crop →
  resize → HSV → float batch, fused, batched, bf16-friendly.

Semantics follow ``data/augment.py`` (itself parity with the reference):
zero-padded crop, center-sample nearest resize, alpha composite, the PIL
0..255 hue wheel with single wraparound.  The one necessary divergence:
crops are expressed as a normalized affine sample (scale+offset) instead of
integer pixel rectangles, so sub-pixel rounding differs from PIL by ≤1 px —
parity-by-metric, as with every other augmentation backend here.

All samples in a batch share the output shape (the multi-scale bucket), so
shapes are static per bucket and XLA caches one executable per bucket.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AugmentParams", "draw_params", "augment_batch"]


class AugmentParams(NamedTuple):
    """Per-sample augmentation parameters (host-drawn, device-applied)."""
    pleft: jax.Array    # (B,) crop origin x (pixels, may be negative)
    ptop: jax.Array     # (B,)
    swidth: jax.Array   # (B,) crop width in source pixels
    sheight: jax.Array  # (B,)
    dhue: jax.Array     # (B,) hue shift in [-1, 1] PIL scale
    dsat: jax.Array     # (B,) saturation factor
    dexp: jax.Array     # (B,) value factor


def draw_params(rng: np.random.RandomState, B: int, ow: int, oh: int, *,
                jitter: float, hue: float, saturation: float,
                exposure: float) -> Tuple[AugmentParams, np.ndarray]:
    """Draw reference-distribution parameters for a batch.

    Same per-sample draw order as ``augment.data_augmentation`` so label
    transforms agree.  Returns (params, label_transform (B,4) [dx,dy,sx,sy]).
    """
    from .augment import rand_scale

    dw, dh = int(ow * jitter), int(oh * jitter)
    out = {k: np.zeros(B, np.float32) for k in AugmentParams._fields}
    lab = np.zeros((B, 4), np.float32)
    for b in range(B):
        pleft = rng.randint(-dw, dw + 1)
        pright = rng.randint(-dw, dw + 1)
        ptop = rng.randint(-dh, dh + 1)
        pbot = rng.randint(-dh, dh + 1)
        swidth = ow - pleft - pright
        sheight = oh - ptop - pbot
        _flip = bool(rng.randint(2))          # drawn, never applied (parity)
        sx, sy = swidth / ow, sheight / oh
        out["pleft"][b], out["ptop"][b] = pleft, ptop
        out["swidth"][b], out["sheight"][b] = swidth, sheight
        out["dhue"][b] = rng.uniform(-hue, hue)
        out["dsat"][b] = rand_scale(rng, saturation)
        out["dexp"][b] = rand_scale(rng, exposure)
        lab[b] = [(pleft / ow) / sx, (ptop / oh) / sy, sx, sy]
    params = AugmentParams(**{k: jnp.asarray(v) for k, v in out.items()})
    return params, lab


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(mx == r, ((g - b) / safe) % 6.0,
                  jnp.where(mx == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0))
    h = jnp.where(d == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    h6 = h * 6.0
    i = jnp.floor(h6) % 6
    f = h6 - jnp.floor(h6)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def _distort_hsv(img, dhue, dsat, dexp):
    """Quantized-u8 HSV pipeline matching ``augment.distort_hsv``."""
    h, s, v = _rgb_to_hsv(img)
    hq = jnp.floor(h * 255.0)
    sq = jnp.floor(s * 255.0)
    vq = jnp.floor(v * 255.0)
    sf = jnp.clip(sq * dsat, 0.0, 255.0)
    vf = jnp.clip(vq * dexp, 0.0, 255.0)
    hf = hq + dhue * 255.0
    hf = jnp.where(hf > 255.0, hf - 255.0, hf)
    hf = jnp.where(hf < 0.0, hf + 255.0, hf)
    out = _hsv_to_rgb(jnp.floor(hf) / 255.0, jnp.floor(sf) / 255.0,
                      jnp.floor(vf) / 255.0)
    return jnp.floor(jnp.clip(out * 255.0, 0.0, 255.0)) / 255.0


def _crop_resize_one(img, pleft, ptop, swidth, sheight, out_w, out_h):
    """Zero-padded crop + center-sample nearest resize, dynamic crop params.

    Output pixel (x,y) samples source index
    ``pleft + floor((x+0.5)·swidth/out_w)`` (≡ crop-then-nearest), with
    out-of-bounds reads masked to 0 (≡ the zero-padded crop).

    Implemented as two one-hot selection matmuls so the resample runs on the
    MXU: per-sample dynamic gathers lower to a serialized scatter/gather on
    TPU (measured ~7 s for a batch of 16 at 640×480→416²), while the
    equivalent einsum with 0/1 selection matrices runs in milliseconds.
    HIGHEST precision keeps u8/255 pixel values bit-exact through the
    selection (one-hot rows have a single 1, so accumulation is exact);
    ``device_synth._crop_resize_u8`` is the faster int8-MXU variant for u8
    sources.
    """
    precision = jax.lax.Precision.HIGHEST
    ih, iw = img.shape[0], img.shape[1]
    xs = pleft + jnp.floor((jnp.arange(out_w) + 0.5) * swidth / out_w)
    ys = ptop + jnp.floor((jnp.arange(out_h) + 0.5) * sheight / out_h)
    xin = (xs >= 0) & (xs <= iw - 1)
    yin = (ys >= 0) & (ys <= ih - 1)
    xi = jnp.clip(xs, 0, iw - 1).astype(jnp.int32)
    yi = jnp.clip(ys, 0, ih - 1).astype(jnp.int32)
    sel_y = jax.nn.one_hot(yi, ih, dtype=img.dtype)        # (out_h, ih)
    sel_x = jax.nn.one_hot(xi, iw, dtype=img.dtype)        # (out_w, iw)
    rows = jnp.einsum("oi,iwc->owc", sel_y, img, precision=precision)
    out = jnp.einsum("pw,owc->opc", sel_x, rows, precision=precision)
    mask = (yin[:, None] & xin[None, :])[..., None]
    return jnp.where(mask, out, 0.0)


@functools.partial(jax.jit, static_argnames=("out_w", "out_h"))
def augment_batch(images: jax.Array, masks: jax.Array, bgs: jax.Array,
                  params: AugmentParams, out_w: int, out_h: int) -> jax.Array:
    """Full train-sample augmentation for a batch, on device.

    Args:
      images: (B, H, W, 3) uint8 (the production path — 4x lighter
        host→device transfer) or float32 in [0,1], at native size.
      masks: (B, H, W, 1) same dtype family; full/ones to skip compositing.
      bgs: (B, H, W, 3) backgrounds pre-resized to the image size
        (host nearest-resize, or reuse of a device-cached bg batch).
      params: per-sample crop/HSV parameters.

    Returns (B, out_h, out_w, 3) float32 in [0,1].

    Integer inputs composite as a hard select (``mask >= 128`` keeps the
    foreground): LINEMOD masks are binary, so this equals the reference's
    alpha blend (``image.py:110-127``) while keeping every intermediate an
    exact u8 — composite, crop and u8→f32 conversion are then identical
    integer programs in every backend that shares them (``device_bank``),
    making cross-backend bit-equality robust to XLA fusion/FMA choices
    instead of hostage to them.  Float inputs take the legacy alpha-blend
    path (soft masks blend; sub-ULP FMA differences possible vs the
    integer path).
    """
    from .device_synth import _crop_resize_u8

    if all(jnp.issubdtype(a.dtype, jnp.integer) for a in (images, masks, bgs)):
        comp = jnp.where(masks >= 128, images, bgs)        # exact u8 select

        def one_u8(img, pleft, ptop, sw, sh, dhue, dsat, dexp):
            crop = _crop_resize_u8(img, pleft, ptop, sw, sh, out_w, out_h)
            return _distort_hsv(crop, dhue, dsat, dexp)

        return jax.vmap(one_u8)(comp, params.pleft, params.ptop,
                                params.swidth, params.sheight, params.dhue,
                                params.dsat, params.dexp)

    if jnp.issubdtype(images.dtype, jnp.integer):
        images = images.astype(jnp.float32) / 255.0
    if jnp.issubdtype(masks.dtype, jnp.integer):
        masks = masks.astype(jnp.float32) / 255.0
    if jnp.issubdtype(bgs.dtype, jnp.integer):
        bgs = bgs.astype(jnp.float32) / 255.0
    comp = images * masks + bgs * (1.0 - masks)

    def one(img, pleft, ptop, sw, sh, dhue, dsat, dexp):
        crop = _crop_resize_one(img, pleft, ptop, sw, sh, out_w, out_h)
        return _distort_hsv(crop, dhue, dsat, dexp)

    return jax.vmap(one)(comp, params.pleft, params.ptop, params.swidth,
                         params.sheight, params.dhue, params.dsat,
                         params.dexp)
