"""Pallas TPU kernels for the target-assignment hot path.

The heaviest op in the region loss is pass 1 of ``build_targets``: the
max-over-ground-truths corner confidence of every predicted cell
(reference: ``region_loss.py:27-41``, rebuilt vectorized in
``ops/targets.py``).  The XLA formulation materializes a (B, G, S)
confidence tensor (plus a (B, G, S, K) distance intermediate under the
hood) — at multi-object scale (B=32, G=50, S=845) that's hundreds of MB of
HBM traffic for a result of shape (B, S).

``max_corner_confidence`` computes the same reduction in VMEM: grid over
(batch, cell-tile), with cells on the 128-lane axis and the K=9 keypoints on
sublanes; the G ground-truth slots are walked with an on-chip
``fori_loop``, so no (G × S) intermediate ever leaves VMEM.

Numerics match ``ops.confidence.corner_confidences`` exactly (same masked
exponential, same eps), verified bit-exact on TPU (max abs diff 0.0 vs the
XLA formulation) and in interpret mode in tests.

Measured on TPU v5e (B=32, G=50, K=9): S=845 (13×13×5 anchors) 0.61 ms vs
XLA 0.60 ms (parity — XLA fuses this size well); S=3380 (26×26×5, the 832 px
multi-scale bucket) 1.24 ms vs 1.50 ms (−17%, the HBM-intermediate savings
kick in as S grows).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["max_corner_confidence", "max_corner_confidence_sharded",
           "pallas_supported"]


def pallas_supported() -> bool:
    """True when the default backend can run compiled Pallas TPU kernels."""
    return jax.default_backend() == "tpu"


def _kernel(gx_ref, gy_ref, valid_ref, px_ref, py_ref, out_ref, *,
            K: int, th: float, sharpness: float, im_w: float, im_h: float,
            inv_denom: float, inv_k: float):
    # blocks: gx/gy (1, G, K) f32, valid (1, G, 1) f32,
    #         px/py (1, K, TS) f32 → out (1, 1, TS)
    # Statically unrolled over the K=9 keypoints; the (G, TS) pair tile lives
    # only in VMEM/registers and is max-reduced over sublanes (G) at the end.
    px = px_ref[0]                     # (K, TS)
    py = py_ref[0]
    gx = gx_ref[0]                     # (G, K)
    gy = gy_ref[0]

    conf_sum = None
    for k in range(K):                 # static unroll: k indexes lanes/sublanes
        dx = (gx[:, k][:, None] - px[k][None, :]) * im_w   # (G, TS)
        dy = (gy[:, k][:, None] - py[k][None, :]) * im_h
        d = jnp.sqrt(dx * dx + dy * dy)
        conf = (jnp.exp(sharpness * (1.0 - d / th)) - 1.0) * inv_denom
        conf = jnp.where(d < th, conf, 0.0)
        conf_sum = conf if conf_sum is None else conf_sum + conf

    mean = conf_sum * inv_k * valid_ref[0]         # (G, TS) · (G, 1)
    out_ref[0, 0] = jnp.max(mean, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "th", "sharpness", "im_width", "im_height", "interpret"))
def max_corner_confidence(gt_corners: jax.Array, valid: jax.Array,
                          pred_corners: jax.Array, *, th: float = 80.0,
                          sharpness: float = 2.0, im_width: float = 640.0,
                          im_height: float = 480.0,
                          interpret: bool = False) -> jax.Array:
    """max over valid GTs of the mean keypoint confidence, per cell.

    Args:
      gt_corners: (B, G, 2K) normalized GT keypoints.
      valid: (B, G) bool/float GT-slot validity.
      pred_corners: (B, S, 2K) normalized predictions.

    Returns (B, S) float32 — identical to
    ``max(where(valid, corner_confidences(gt[:,:,None], pred[:,None]), 0), 1)``.
    """
    B, G, K2 = gt_corners.shape
    K = K2 // 2
    S = pred_corners.shape[1]

    # split x/y and put cells on lanes / keypoints on sublanes
    gt = gt_corners.astype(jnp.float32).reshape(B, G, K, 2)
    gx, gy = gt[..., 0], gt[..., 1]                      # (B, G, K)
    pr = pred_corners.astype(jnp.float32).reshape(B, S, K, 2)
    px = pr[..., 0].transpose(0, 2, 1)                   # (B, K, S)
    py = pr[..., 1].transpose(0, 2, 1)

    TS = 512 if S >= 512 else max(128, 1 << max(7, (S - 1).bit_length()))
    S_pad = ((S + TS - 1) // TS) * TS
    px = jnp.pad(px, ((0, 0), (0, 0), (0, S_pad - S)))
    py = jnp.pad(py, ((0, 0), (0, 0), (0, S_pad - S)))
    vf = valid.astype(jnp.float32).reshape(B, G, 1)

    inv_denom = 1.0 / (math.exp(sharpness) - 1.0 + 1e-5)
    kern = functools.partial(
        _kernel, K=K, th=th, sharpness=sharpness, im_w=im_width,
        im_h=im_height, inv_denom=inv_denom, inv_k=1.0 / K)

    grid = (B, S_pad // TS)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 1, S_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, G, K), lambda b, s: (b, 0, 0)),     # gx
            pl.BlockSpec((1, G, K), lambda b, s: (b, 0, 0)),     # gy
            pl.BlockSpec((1, G, 1), lambda b, s: (b, 0, 0)),     # valid
            pl.BlockSpec((1, K, TS), lambda b, s: (b, 0, s)),    # px
            pl.BlockSpec((1, K, TS), lambda b, s: (b, 0, s)),    # py
        ],
        out_specs=pl.BlockSpec((1, 1, TS), lambda b, s: (b, 0, s)),
        interpret=interpret,
    )(gx, gy, vf, px, py)
    return out[:, 0, :S]


def max_corner_confidence_sharded(gt_corners: jax.Array, valid: jax.Array,
                                  pred_corners: jax.Array, mesh, *,
                                  th: float = 80.0, sharpness: float = 2.0,
                                  im_width: float = 640.0,
                                  im_height: float = 480.0,
                                  interpret: bool = False) -> jax.Array:
    """:func:`max_corner_confidence` under a ("data","model") mesh.

    Mosaic custom calls have no GSPMD partitioning rule, so inside pjit the
    bare kernel would force XLA to gather the full batch onto every device.
    The reduction is batch-independent, so ``shard_map`` over the mesh's
    ``data`` axis runs the kernel per-device on the local batch shard — no
    collectives, bit-identical to the single-device kernel.  All three inputs
    are batch-sharded activations (replicated over ``model``), so every
    model-rank computes the same shard; ``check_vma=False`` because the
    varying-axes checker cannot see through the Mosaic custom call.
    """
    fn = functools.partial(max_corner_confidence, th=th, sharpness=sharpness,
                           im_width=im_width, im_height=im_height,
                           interpret=interpret)
    from jax.sharding import PartitionSpec as P
    spec3 = P("data", None, None)
    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(spec3, P("data", None), spec3),
                         out_specs=P("data", None),
                         check_vma=False)(gt_corners, valid, pred_corners)
