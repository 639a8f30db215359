"""Grid decode / post-processing — fully vectorized, on-device.

Replaces the reference's GPU→CPU copy + 4-deep Python scan
(``utils.py:216-296`` ``get_region_boxes``; ``utils_multi.py:266-382``
``get_multi_region_boxes``) with XLA ops so eval keeps the TPU busy.

Layout contract: the head tensor is NHWC (B, H, W, nA*(2K+1+C)) with the
anchor index *major* in the channel dim (matching the reference's
``view(nB, nA, 2K+1+C, nH, nW)``).  Flattened cell index is anchor-major,
``s = a*H*W + cy*W + cx`` — the same ordering the reference scans, so
first-max argmax tie-breaking matches its strict ``>`` update rule for the
single-anchor case.

Deliberate divergences from the reference (documented, saner semantics):
  * single-object best-box is computed *per image*; the reference never
    resets ``max_conf`` across batch elements (``utils.py:230``) and with
    batch>1 returns one box for the whole batch (it only ever runs at B=1).
  * the multi-object fallback tracker resets both running maxima per image;
    the reference carries ``max_cls_conf`` across images
    (``utils_multi.py:280``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["DecodedGrid", "split_activate", "decode_grid", "best_boxes",
           "best_box_for_class", "best_boxes_per_class",
           "multi_region_boxes_np", "bbox_iou", "bbox_ious", "nms"]


def split_activate(output: jax.Array, num_keypoints: int, num_classes: int,
                   num_anchors: int):
    """Shared head split + activation for decode AND the loss.

    Layout contract (single source of truth): NHWC head → anchor-major
    flattened cells ``s = a·H·W + cy·W + cx``; sigmoid on the centroid
    keypoint (k=0) and objectness, raw offsets for the 8 corners
    (reference: ``region_loss.py:109-116`` / ``utils.py:236-248``).

    Returns (xs, ys, conf, cls_logits, grid_x, grid_y):
      xs/ys (B,S,K) in-cell offsets, conf (B,S), cls_logits (B,S,C),
      grid_x/grid_y (S,) cell coordinates.
    """
    B, H, W, D = output.shape
    K, C, nA = num_keypoints, num_classes, num_anchors
    assert D == nA * (2 * K + 1 + C), (D, nA, K, C)
    out = output.reshape(B, H, W, nA, 2 * K + 1 + C)
    out = out.transpose(0, 3, 1, 2, 4).reshape(B, nA * H * W, 2 * K + 1 + C)

    kp = out[..., :2 * K].reshape(B, nA * H * W, K, 2)
    x0y0 = jax.nn.sigmoid(kp[..., 0:1, :])
    kp = jnp.concatenate([x0y0, kp[..., 1:, :]], axis=-2)
    xs, ys = kp[..., 0], kp[..., 1]
    conf = jax.nn.sigmoid(out[..., 2 * K])
    cls_logits = out[..., 2 * K + 1:]

    gx = jnp.tile(jnp.arange(W, dtype=output.dtype)[None, :], (H, 1)).reshape(-1)
    gy = jnp.tile(jnp.arange(H, dtype=output.dtype)[:, None], (1, W)).reshape(-1)
    grid_x = jnp.tile(gx, (nA,))
    grid_y = jnp.tile(gy, (nA,))
    return xs, ys, conf, cls_logits, grid_x, grid_y


class DecodedGrid(NamedTuple):
    """Per-cell decoded predictions; S = nA*H*W, anchor-major."""
    corners: jax.Array    # (B, S, 2K) normalized to [0,1] grid fractions
    det_conf: jax.Array   # (B, S) sigmoid objectness
    cls_probs: jax.Array  # (B, S, C) softmax class distribution


def decode_grid(output: jax.Array, num_keypoints: int, num_classes: int,
                num_anchors: int) -> DecodedGrid:
    """Decode the raw head tensor.

    Activations per reference ``region_loss.py:109-116`` / ``utils.py:236-248``:
    sigmoid on the centroid x/y (keypoint 0) and objectness, raw offsets for
    the 8 corner keypoints, softmax over classes; all plus the cell's grid
    coordinate, normalized by grid W/H.
    """
    B, H, W, _ = output.shape
    K, C, nA = num_keypoints, num_classes, num_anchors
    xs, ys, det_conf, cls_logits, grid_x, grid_y = split_activate(
        output, K, C, nA)
    px = (xs + grid_x[None, :, None]) / W   # (B, S, K)
    py = (ys + grid_y[None, :, None]) / H
    corners = jnp.stack([px, py], axis=-1).reshape(B, nA * H * W, 2 * K)
    cls_probs = jax.nn.softmax(cls_logits, axis=-1) if C > 0 else \
        jnp.ones((B, nA * H * W, 0), output.dtype)
    return DecodedGrid(corners, det_conf, cls_probs)


def _cell_taker(idx: jax.Array):
    """Gather one cell per image: (B,S,...) → (B,...) at idx (B,)."""
    def take(a):
        return jnp.take_along_axis(
            a, idx.reshape(idx.shape + (1,) * (a.ndim - 1)), axis=1)[:, 0]
    return take


def best_boxes(decoded: DecodedGrid, only_objectness: bool = True) -> jax.Array:
    """Single-object selection: per image, the max-confidence cell.

    Returns (B, 2K+3): [18 normalized coords, det_conf, cls_max_conf, cls_id]
    — the reference's box layout (``utils.py:276-288``).
    """
    corners, det_conf, cls_probs = decoded
    C = cls_probs.shape[-1]
    cls_max = jnp.max(cls_probs, axis=-1) if C > 0 else jnp.ones_like(det_conf)
    cls_id = jnp.argmax(cls_probs, axis=-1) if C > 0 else \
        jnp.zeros(det_conf.shape, jnp.int32)
    score = det_conf if only_objectness else det_conf * cls_max
    idx = jnp.argmax(score, axis=-1)  # first max wins, matching scan order
    take = _cell_taker(idx)
    return jnp.concatenate([
        take(corners),
        take(det_conf)[:, None],
        take(cls_max)[:, None],
        take(cls_id).astype(corners.dtype)[:, None],
    ], axis=-1)


def best_box_for_class(decoded: DecodedGrid, cls: jax.Array, conf_thresh: float,
                       only_objectness: bool = False) -> jax.Array:
    """Multi-object selection for one requested class, on-device.

    Semantics of ``get_multi_region_boxes`` + the eval pick
    (``utils_multi.py:312-370``, ``valid_multi.py:118-123``) collapsed into
    one step: among cells with conf above ``conf_thresh`` whose argmax class
    is ``cls``, take the highest ``det_conf``; if none survive, fall back to
    the reference's sequential joint-maximum tracker (a cell is adopted only
    when BOTH its det_conf and its prob for ``cls`` beat every previously
    adopted cell's — an order-dependent fold, reproduced exactly with a scan).

    Returns (B, 2K+3) boxes; ``cls`` may be a scalar or (B,) per-image class.
    """
    corners, det_conf, cls_probs = decoded
    B, S = det_conf.shape
    cls = jnp.broadcast_to(jnp.asarray(cls, jnp.int32), (B,))
    cls_max = jnp.max(cls_probs, axis=-1)
    cls_id = jnp.argmax(cls_probs, axis=-1)
    conf = det_conf if only_objectness else det_conf * cls_max
    cls_p = jnp.take_along_axis(cls_probs, cls[:, None, None], axis=-1)[..., 0]  # (B,S)

    keep = (conf > conf_thresh) & (cls_id == cls[:, None])
    any_keep = jnp.any(keep, axis=-1)
    kept_score = jnp.where(keep, det_conf, -jnp.inf)
    kept_idx = jnp.argmax(kept_score, axis=-1)

    # Fallback: sequential joint-max fold over cells in scan order.
    def fold(carry, xs):
        best_det, best_cls, best_ind = carry
        d, c, i = xs
        upd = (d > best_det) & (c > best_cls)
        return (jnp.where(upd, d, best_det), jnp.where(upd, c, best_cls),
                jnp.where(upd, i, best_ind)), None

    def run_fold(d_row, c_row):
        init = (jnp.asarray(-jnp.inf, d_row.dtype), jnp.asarray(-jnp.inf, c_row.dtype),
                jnp.asarray(0, jnp.int32))
        (bd, bc, bi), _ = lax.scan(fold, init, (d_row, c_row, jnp.arange(S, dtype=jnp.int32)))
        return bi, bd, bc

    fb_idx, fb_det, fb_cls = jax.vmap(run_fold)(det_conf, cls_p)

    idx = jnp.where(any_keep, kept_idx, fb_idx)
    take = _cell_taker(idx)
    out_det = jnp.where(any_keep, take(det_conf), fb_det)
    out_clsconf = jnp.where(any_keep, take(cls_max), fb_cls)
    return jnp.concatenate([
        take(corners),
        out_det[:, None],
        out_clsconf[:, None],
        cls.astype(corners.dtype)[:, None],
    ], axis=-1)


def best_boxes_per_class(decoded: DecodedGrid, conf_thresh: float,
                         only_objectness: bool = False) -> jax.Array:
    """Class-picked boxes for EVERY class at once: (B, C, 2K+3).

    Same per-class semantics as :func:`best_box_for_class` (threshold+argmax
    with the reference's sequential joint-max fallback) so multi-GT eval can
    pair each ground truth with the box of its own class (reference:
    ``valid_multi.py:118-123`` matches ``boxes[j][2K+2] == truths[k][0]``
    per GT).  The order-dependent fallback fold runs as ONE S-length scan
    with a C-wide carry (det_conf is class-independent), not C separate
    scans — the scan is the latency-bound part on TPU.
    """
    corners, det_conf, cls_probs = decoded
    B, S = det_conf.shape
    C = cls_probs.shape[-1]
    cls_max = jnp.max(cls_probs, axis=-1)
    cls_id = jnp.argmax(cls_probs, axis=-1)
    conf = det_conf if only_objectness else det_conf * cls_max

    # thresholded fast path, all classes at once: (B, C, S)
    keep = (conf > conf_thresh)[:, None, :] & \
        (cls_id[:, None, :] == jnp.arange(C, dtype=cls_id.dtype)[None, :, None])
    any_keep = jnp.any(keep, axis=-1)                         # (B, C)
    kept_idx = jnp.argmax(jnp.where(keep, det_conf[:, None, :], -jnp.inf),
                          axis=-1)                            # (B, C)

    # fallback fold, one pass over cells with per-class joint maxima
    def fold(carry, xs):
        best_det, best_cls, best_ind = carry                  # (C,),(C,),(C,)
        d, p, i = xs                                          # (), (C,), ()
        upd = (d > best_det) & (p > best_cls)
        return (jnp.where(upd, d, best_det), jnp.where(upd, p, best_cls),
                jnp.where(upd, i, best_ind)), None

    def run_fold(d_row, p_row):                               # (S,), (S, C)
        init = (jnp.full((C,), -jnp.inf, d_row.dtype),
                jnp.full((C,), -jnp.inf, p_row.dtype),
                jnp.zeros((C,), jnp.int32))
        (bd, bc, bi), _ = lax.scan(
            fold, init, (d_row, p_row, jnp.arange(S, dtype=jnp.int32)))
        return bi, bd, bc

    fb_idx, fb_det, fb_cls = jax.vmap(run_fold)(det_conf, cls_probs)  # (B,C)

    idx = jnp.where(any_keep, kept_idx, fb_idx)               # (B, C)
    # gather per (b, c): corners/det/cls_max at idx
    bidx = jnp.arange(B)[:, None]
    g_corners = corners[bidx, idx]                            # (B, C, 2K)
    g_det = det_conf[bidx, idx]
    g_clsmax = cls_max[bidx, idx]
    out_det = jnp.where(any_keep, g_det, fb_det)
    out_clsconf = jnp.where(any_keep, g_clsmax, fb_cls)
    cls_col = jnp.broadcast_to(
        jnp.arange(C, dtype=corners.dtype)[None, :], (B, C))
    return jnp.concatenate([
        g_corners, out_det[..., None], out_clsconf[..., None],
        cls_col[..., None]], axis=-1)


def bbox_iou(box1, box2, x1y1x2y2: bool = False) -> float:
    """IoU of two boxes, center (cx,cy,w,h) or corner form — the union-box
    formulation of the reference (``utils_multi.py:125-156``): the
    intersection is derived as w1+w2−union_w (negative ⇒ disjoint ⇒ 0)."""
    if x1y1x2y2:
        mx, Mx = min(box1[0], box2[0]), max(box1[2], box2[2])
        my, My = min(box1[1], box2[1]), max(box1[3], box2[3])
        w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
        w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    else:
        mx = min(box1[0] - box1[2] / 2.0, box2[0] - box2[2] / 2.0)
        Mx = max(box1[0] + box1[2] / 2.0, box2[0] + box2[2] / 2.0)
        my = min(box1[1] - box1[3] / 2.0, box2[1] - box2[3] / 2.0)
        My = max(box1[1] + box1[3] / 2.0, box2[1] + box2[3] / 2.0)
        w1, h1, w2, h2 = box1[2], box1[3], box2[2], box2[3]
    cw = w1 + w2 - (Mx - mx)
    ch = h1 + h2 - (My - my)
    if cw <= 0 or ch <= 0:
        return 0.0
    carea = cw * ch
    return carea / (w1 * h1 + w2 * h2 - carea)


def bbox_ious(boxes1: jax.Array, boxes2: jax.Array,
              x1y1x2y2: bool = False) -> jax.Array:
    """Vectorized pairwise IoU: (..., 4) × (..., 4) broadcastable → (...)."""
    if x1y1x2y2:
        x11, y11, x12, y12 = (boxes1[..., i] for i in range(4))
        x21, y21, x22, y22 = (boxes2[..., i] for i in range(4))
        w1, h1 = x12 - x11, y12 - y11
        w2, h2 = x22 - x21, y22 - y21
    else:
        w1, h1 = boxes1[..., 2], boxes1[..., 3]
        w2, h2 = boxes2[..., 2], boxes2[..., 3]
        x11, y11 = boxes1[..., 0] - w1 / 2, boxes1[..., 1] - h1 / 2
        x12, y12 = boxes1[..., 0] + w1 / 2, boxes1[..., 1] + h1 / 2
        x21, y21 = boxes2[..., 0] - w2 / 2, boxes2[..., 1] - h2 / 2
        x22, y22 = boxes2[..., 0] + w2 / 2, boxes2[..., 1] + h2 / 2
    uw = jnp.maximum(x12, x22) - jnp.minimum(x11, x21)
    uh = jnp.maximum(y12, y22) - jnp.minimum(y11, y21)
    cw = w1 + w2 - uw
    ch = h1 + h2 - uh
    carea = jnp.where((cw > 0) & (ch > 0), cw * ch, 0.0)
    return carea / jnp.maximum(w1 * h1 + w2 * h2 - carea, 1e-12)


def nms(boxes, nms_thresh: float):
    """Greedy NMS over box lists (reference: ``utils_multi.py:223-241``).

    ``boxes``: sequence of arrays whose [0:4] is a center-form bbox and [4]
    the detection confidence; sorted descending by conf, suppressing any
    later box with IoU > thresh.  Defined for toolkit parity — the eval path
    uses class-filtered max-conf selection instead (``valid_multi.py:118``).
    """
    import numpy as np

    if len(boxes) == 0:
        return boxes
    boxes = [np.array(b, dtype=np.float32).copy() for b in boxes]
    order = np.argsort([-b[4] for b in boxes], kind="stable")
    out = []
    for oi, i in enumerate(order):
        bi = boxes[i]
        if bi[4] > 0:
            out.append(bi)
            for j in order[oi + 1:]:
                if bbox_iou(bi, boxes[j]) > nms_thresh:
                    boxes[j][4] = 0
    return out


def multi_region_boxes_np(decoded: DecodedGrid, conf_thresh: float,
                          correspondingclass: int, only_objectness: bool = True):
    """Host-side full box list per image (toolkit parity with
    ``get_multi_region_boxes``): all cells above threshold, plus the fallback
    box when the requested class is missing.  Returns a list (len B) of
    [ (2K+3,) float arrays ].
    """
    import numpy as np

    corners = np.asarray(decoded.corners)
    det = np.asarray(decoded.det_conf)
    cls_probs = np.asarray(decoded.cls_probs)
    B, S, _ = corners.shape
    cls_max = cls_probs.max(-1)
    cls_id = cls_probs.argmax(-1)
    conf = det if only_objectness else det * cls_max
    all_boxes = []
    for b in range(B):
        keep = np.nonzero(conf[b] > conf_thresh)[0]
        boxes = [np.concatenate([corners[b, s], [det[b, s], cls_max[b, s], cls_id[b, s]]])
                 for s in keep]
        if not boxes or not np.any(cls_id[b, keep] == correspondingclass):
            best_det, best_cls, best_ind = -np.inf, -np.inf, 0
            for s in range(S):
                if det[b, s] > best_det and cls_probs[b, s, correspondingclass] > best_cls:
                    best_det, best_cls, best_ind = det[b, s], cls_probs[b, s, correspondingclass], s
            boxes.append(np.concatenate([
                corners[b, best_ind], [best_det, best_cls, float(correspondingclass)]]))
        all_boxes.append(boxes)
    return all_boxes
