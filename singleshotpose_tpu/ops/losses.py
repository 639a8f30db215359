"""Region loss (single- and multi-object), fully on-device.

Rebuild of ``RegionLoss`` (reference: ``region_loss.py:80-175`` single,
``region_loss_multi.py:97-189`` multi) as one pure function: raw NHWC head →
scalar loss + stats, differentiable end-to-end under jit/pjit.

Loss algebra preserved exactly:
  * per-keypoint masked sum-squared-error / 2, coord_scale weighted (the
    reference's ``MSELoss(size_average=False)(x*mask, tx*mask)/2`` with a
    binary mask ≡ ``Σ mask·(x-tx)²/2``),
  * confidence term weighted by conf_mask (the reference multiplies both
    operands by ``conf_mask.sqrt()`` — same thing),
  * multi-object adds ``class_scale · Σ CE(cls_logits, tcls)`` over
    responsible cells; single-object has **no class loss**
    (``region_loss.py:157``),
  * during the first ``pretrain_num_epochs`` epochs the confidence term is
    dropped (``region_loss.py:156-161``); gating is a traced ``where`` so the
    epoch number can be a device scalar without retracing.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .targets import BuiltTargets, build_targets

__all__ = ["RegionLossConfig", "region_loss", "activate_head"]


@dataclasses.dataclass(frozen=True)
class RegionLossConfig:
    num_keypoints: int = 9
    num_classes: int = 1
    num_anchors: int = 1
    anchors: Tuple[float, ...] = ()
    coord_scale: float = 1.0
    noobject_scale: float = 1.0
    object_scale: float = 5.0
    class_scale: float = 1.0
    sil_thresh: float = 0.6
    pretrain_num_epochs: int = 15
    with_class_loss: bool = False   # True for the multi-object variant
    im_width: float = 640.0
    im_height: float = 480.0
    max_num_gt: int = 50
    # None → auto (Pallas on TPU).  Under a sharded mesh, also set ``mesh``
    # so the kernel runs per-device via shard_map (Mosaic custom calls have
    # no GSPMD partitioning rule on their own).
    use_pallas: Optional[bool] = None
    mesh: Optional[object] = None   # jax.sharding.Mesh (hashable)

    @classmethod
    def single(cls, pretrain_num_epochs: int = 15, **kw) -> "RegionLossConfig":
        """Defaults of the single-object RegionLoss (``region_loss.py:81-93``).

        Note the reference *hard-codes* noobject_scale=1/object_scale=5 in the
        loss module and ignores the [region] block values for the driver-built
        loss (``train.py:335``); pass overrides to honor a cfg instead."""
        return cls(pretrain_num_epochs=pretrain_num_epochs, **kw)

    @classmethod
    def multi(cls, anchors: Tuple[float, ...], num_classes: int = 13,
              num_anchors: int = 5, pretrain_num_epochs: int = 15,
              **kw) -> "RegionLossConfig":
        return cls(num_classes=num_classes, num_anchors=num_anchors,
                   anchors=anchors, with_class_loss=True,
                   pretrain_num_epochs=pretrain_num_epochs, **kw)


def activate_head(output: jax.Array, K: int, C: int, nA: int):
    """Split + activate the raw NHWC head (via the shared
    :func:`~singleshotpose_tpu.ops.decode.split_activate`, keeping the
    loss and the inference decode on one layout contract).

    Returns (xs, ys, conf, cls_logits, pred_corners):
      xs/ys (B,S,K) in-cell offsets (sigmoid on keypoint 0 only),
      conf  (B,S) sigmoid objectness,
      cls_logits (B,S,C) raw logits,
      pred_corners (B,S,2K) normalized grid coords, stop-gradiented
      (matches the reference's detached pred box build,
      ``region_loss.py:118-127``).
    """
    from .decode import split_activate

    B, H, W, _ = output.shape
    xs, ys, conf, cls_logits, grid_x, grid_y = split_activate(
        output, K, C, nA)
    px = (xs + grid_x[None, :, None]) / W
    py = (ys + grid_y[None, :, None]) / H
    pred_corners = jax.lax.stop_gradient(
        jnp.stack([px, py], axis=-1).reshape(B, nA * H * W, 2 * K))
    return xs, ys, conf, cls_logits, pred_corners


def region_loss(output: jax.Array, target: jax.Array, epoch,
                cfg: RegionLossConfig) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Compute the region loss.

    Args:
      output: raw head (B, H, W, nA*(2K+1+C)) NHWC.
      target: (B, max_num_gt*(2K+3)) padded labels.
      epoch: python int or traced scalar — confidence gating threshold.

    Returns (loss, stats).
    """
    K, C, nA = cfg.num_keypoints, cfg.num_classes, cfg.num_anchors
    B, H, W, _ = output.shape
    out32 = output.astype(jnp.float32)
    xs, ys, conf, cls_logits, pred_corners = activate_head(out32, K, C, nA)

    bt: BuiltTargets = build_targets(
        pred_corners, target.astype(jnp.float32),
        num_keypoints=K, num_anchors=nA, nH=H, nW=W,
        noobject_scale=cfg.noobject_scale, object_scale=cfg.object_scale,
        sil_thresh=cfg.sil_thresh, anchors=cfg.anchors,
        im_width=cfg.im_width, im_height=cfg.im_height,
        max_num_gt=cfg.max_num_gt, use_pallas=cfg.use_pallas, mesh=cfg.mesh)

    cm = bt.coord_mask[:, :, None]
    loss_x = cfg.coord_scale * 0.5 * jnp.sum(cm * jnp.square(xs - bt.txs))
    loss_y = cfg.coord_scale * 0.5 * jnp.sum(cm * jnp.square(ys - bt.tys))
    loss_conf = 0.5 * jnp.sum(bt.conf_mask * jnp.square(conf - bt.tconf))

    if cfg.with_class_loss and C > 1:
        logp = jax.nn.log_softmax(cls_logits, axis=-1)
        picked = jnp.take_along_axis(logp, bt.tcls[:, :, None], axis=-1)[..., 0]
        loss_cls = cfg.class_scale * jnp.sum(
            jnp.where(bt.cls_mask, -picked, 0.0))
    else:
        loss_cls = jnp.asarray(0.0, jnp.float32)

    base = loss_x + loss_y + loss_cls
    epoch = jnp.asarray(epoch)
    loss = jnp.where(epoch > cfg.pretrain_num_epochs, base + loss_conf, base)

    stats = {
        "loss": loss,
        "loss_x": loss_x,
        "loss_y": loss_y,
        "loss_conf": loss_conf,
        "loss_cls": loss_cls,
        "nGT": bt.num_gt,
        "nCorrect": bt.num_correct,
        "nProposals": jnp.sum((conf > 0.25).astype(jnp.int32)),
    }
    return loss, stats
