"""On-device single-object augmentation from an HBM-resident frame bank.

The single-object train pipeline (reference ``image.py:46-127`` via
``data/augment.py``) runs bg-composite → crop-jitter → HSV per sample.  The
existing backends move progressively more of that off the host (``python``
→ ``native`` C++ → ``device`` XLA augmentation of host-decoded frames), but
all of them re-upload every batch's native-size pixels, so a weak host (or
a thin host↔device link) still bounds training throughput.

This backend is the single-object analogue of ``data/device_synth.py``: a
LINEMOD object's train split is tiny (~190 frames × 640·480 ≈ 230 MB with
masks), so the **whole corpus is decoded once and parked in HBM**
(:class:`DeviceFrameBank`, plus a seeded sample of VOC backgrounds).  Each
batch is then one jitted program of (bank, indices, host-drawn params):
gather → crop-resize on the MXU's int8 path → composite → HSV → label
transform, emitting device-resident (images, labels) with zero per-batch
host↔device image traffic.

Exactness: the output is **bit-identical to the ``device`` backend** (and
therefore parity-by-metric with the reference like every device path),
because the per-sample program IS the device backend's: hard u8 select
composite at native size (LINEMOD masks are binary, so select ≡ the
reference's alpha blend), one ``_crop_resize_u8`` (exact int8-MXU
selection), identical u8→f32 conversion, identical HSV chain.  Keeping
every pre-HSV intermediate an exact integer is what makes the equality
robust: two different XLA programs computing the same *float* blend may
legally differ by 1 ulp (FMA contraction is fusion-context-dependent), and
the HSV stage's u8 quantization amplifies those ulps into visible pixel
flips — pinned by ``tests/test_device_bank.py``.

Divergences (same ones the ``device`` backend already carries):
  * crops are normalized affine samples, ≤1 px from PIL rounding
    (parity-by-metric),
  * backgrounds come from a seeded random sample of ``max_backgrounds``
    rows pre-resized to the frame size (the host draws from the full VOC
    list per sample); the host-drawn bg index is mapped onto the bank
    sample with a modulo, keeping the rng stream identical to the
    ``device`` backend's,
  * the label transform runs on device in f32 (the host path computes the
    reciprocal scales in f64 before rounding) — equal to ~1e-7 relative.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.labels import mask_path_from_image
from .augment import resize_nearest
from .device_augment import AugmentParams, _distort_hsv
from .device_synth import _crop_resize_u8

__all__ = ["DeviceFrameBank", "build_frame_bank", "augment_bank_batch"]


class DeviceFrameBank(NamedTuple):
    """HBM-resident single-object train corpus.

    A pytree of arrays (device-placed via :meth:`device_put`):
      images (N, H, W, 3) u8    masks (N, H, W) u8 (255 = keep foreground;
                                all-255 when no backgrounds were given, the
                                ``device`` backend's no-composite behavior)
      truths (N, max_num_gt, 2K+3) f32 — raw label rows at source coords
      n_rows (N,) i32           — real rows per frame (rest are zero pads)
      bgs (NB, H, W, 3) u8      — pre-resized backgrounds (≥1 row; zeros
                                when no backgrounds were given)
    """
    images: jax.Array
    masks: jax.Array
    truths: jax.Array
    n_rows: jax.Array
    bgs: jax.Array

    @property
    def frame_shape(self) -> Tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]     # (H, W)

    def device_put(self, device=None) -> "DeviceFrameBank":
        from ..utils.memory import check_hbm_budget
        check_hbm_budget(self.nbytes(), "device_bank frame bank")
        return jax.tree.map(lambda a: jax.device_put(a, device), self)

    def nbytes(self) -> int:
        return sum(a.nbytes for a in
                   (self.images, self.masks, self.truths, self.bgs))


def build_frame_bank(dataset, *, decode=None,
                     max_backgrounds: int = 256) -> DeviceFrameBank:
    """Decode a train ``PoseDataset``'s corpus once (numpy; call
    ``.device_put()`` to park it in HBM).

    Uses the dataset's own lines / label-path rule / max_num_gt, so the
    bank sees exactly what the host backends see.  ``decode`` defaults to
    the PIL loader; pass ``NativeLoader().decode`` for the C++ path.
    """
    from .pipeline import load_image
    decode = decode or load_image

    K, max_gt = dataset.num_keypoints, dataset.max_num_gt
    nl = 2 * K + 3
    composite = bool(dataset.bg_file_names)

    imgs, msks = [], []
    truths = np.zeros((len(dataset.lines), max_gt, nl), np.float32)
    n_rows = np.zeros(len(dataset.lines), np.int32)
    shape = None
    for i, path in enumerate(dataset.lines):
        img = np.asarray(decode(path), np.uint8)
        if shape is None:
            shape = img.shape
        elif img.shape != shape:
            raise ValueError(
                f"bank frames must share one native size; {path} is "
                f"{img.shape} vs {shape} (LINEMOD is uniformly 640x480)")
        imgs.append(img)
        if composite:
            mask = np.asarray(decode(mask_path_from_image(path)))
            if mask.ndim == 3:
                # channel 0, matching pipeline._device_batch's [..., :1]
                # (masks are binary; channels are equal for real data)
                mask = mask[..., 0]
            msks.append(mask.astype(np.uint8))
        else:
            # no backgrounds → the device backend skips compositing by
            # forcing a full mask (pipeline._device_batch)
            msks.append(np.full(img.shape[:2], 255, np.uint8))
        rows = dataset._read_truths_full(path)
        if rows.size:
            rows = rows.reshape(-1, nl)[:max_gt].astype(np.float32)
            truths[i, :rows.shape[0]] = rows
            n_rows[i] = rows.shape[0]
    if not imgs:
        raise ValueError("empty frame bank: dataset has no lines")
    H, W = shape[:2]

    if composite:
        sel = list(dataset.bg_file_names)
        if len(sel) > max_backgrounds:
            pick = np.random.RandomState(0).choice(
                len(sel), max_backgrounds, replace=False)
            sel = [sel[i] for i in sorted(pick)]
        bgs = np.stack([resize_nearest(
            np.asarray(decode(p), np.uint8), W, H) for p in sel])
    else:
        bgs = np.zeros((1, H, W, 3), np.uint8)

    return DeviceFrameBank(np.stack(imgs), np.stack(msks), truths, n_rows,
                           bgs)


def _transform_rows(rows, n_rows, dx, dy, sx, sy, K: int):
    """Device ``augment.transform_truths``: ``x' = x/sx − dx`` per keypoint,
    centroid clamped to [0, 0.999], trailing extent fields untouched
    (single-object semantics — no recompute), pad rows stay zero."""
    nl = 2 * K + 3
    xs = rows[:, 1:2 * K + 1:2] * (1.0 / sx) - dx
    ys = rows[:, 2:2 * K + 1:2] * (1.0 / sy) - dy
    xs = xs.at[:, 0].set(jnp.clip(xs[:, 0], 0.0, 0.999))
    ys = ys.at[:, 0].set(jnp.clip(ys[:, 0], 0.0, 0.999))
    out = rows.at[:, 1:2 * K + 1:2].set(xs).at[:, 2:2 * K + 1:2].set(ys)
    real = (jnp.arange(rows.shape[0]) < n_rows)[:, None]
    return jnp.where(real, out, jnp.zeros((1, nl), rows.dtype))


@functools.partial(jax.jit, static_argnames=("out_w", "out_h", "K"))
def augment_bank_batch(bank: DeviceFrameBank, idxs: jax.Array,
                       bg_idxs: jax.Array, params: AugmentParams,
                       *, out_w: int, out_h: int, K: int = 9):
    """One augmented train batch, fully on device.

    Args:
      bank: device-placed :class:`DeviceFrameBank`.
      idxs: (B,) int32 frame rows; bg_idxs: (B,) int32 background rows.
      params: host-drawn :class:`AugmentParams` (``draw_params`` — the same
        rng stream as the ``device`` backend).
    Returns (images (B, out_h, out_w, 3) f32 in [0,1],
             labels (B, max_num_gt·(2K+3)) f32).
    """
    H, W = bank.frame_shape

    def one(i, bgi, pleft, ptop, sw, sh, dhue, dsat, dexp):
        comp_u8 = jnp.where(bank.masks[i][..., None] >= 128,
                            bank.images[i], bank.bgs[bgi])
        crop = _crop_resize_u8(comp_u8, pleft, ptop, sw, sh, out_w, out_h)
        out = _distort_hsv(crop, dhue, dsat, dexp)
        sx, sy = sw / W, sh / H
        dx, dy = (pleft / W) / sx, (ptop / H) / sy
        rows = _transform_rows(bank.truths[i], bank.n_rows[i],
                               dx, dy, sx, sy, K)
        return out, rows.reshape(-1)

    return jax.vmap(one)(idxs, bg_idxs, params.pleft, params.ptop,
                         params.swidth, params.sheight, params.dhue,
                         params.dsat, params.dexp)
