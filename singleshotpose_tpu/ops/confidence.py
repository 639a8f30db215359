"""Distance→confidence function c(D) for keypoint rescoring.

Reference semantics (``utils.py:138-187`` ``corner_confidences`` /
``corner_confidence``): per keypoint, the 2D distance between predicted and
ground-truth projections is measured in *pixels* of the original image
(640×480 by default), then mapped through

    c(D) = (exp(sharpness * (1 - D/th)) - 1) / (exp(sharpness) - 1)

masked to 0 where D >= th (th = 80 px, sharpness = 2), and averaged over the
9 keypoints.  One fully-vectorized implementation replaces the reference's
two torch variants (and their duplicate in ``utils_multi.py:159-210``); it
broadcasts over arbitrary leading batch dims so the same code serves target
assignment (B × nGT × nAnchors at once) and decode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["corner_confidences"]


def corner_confidences(gt_corners: jax.Array, pr_corners: jax.Array,
                       th: float = 80.0, sharpness: float = 2.0,
                       im_width: float = 640.0, im_height: float = 480.0) -> jax.Array:
    """Mean keypoint confidence.

    Args:
      gt_corners: (..., 2K) normalized [x0,y0,x1,y1,...] ground truth.
      pr_corners: (..., 2K) predictions, broadcastable against gt.

    Returns:
      (...,) mean confidence over the K keypoints.
    """
    diff = gt_corners - pr_corners
    k2 = diff.shape[-1]
    dist = diff.reshape(diff.shape[:-1] + (k2 // 2, 2))
    dist = dist * jnp.asarray([im_width, im_height], dist.dtype)
    d = jnp.sqrt(jnp.sum(jnp.square(dist), axis=-1))
    eps = 1e-5
    conf = (jnp.exp(sharpness * (1.0 - d / th)) - 1.0) / (jnp.exp(jnp.asarray(sharpness, d.dtype)) - 1.0 + eps)
    conf = jnp.where(d < th, conf, 0.0)
    return jnp.mean(conf, axis=-1)
