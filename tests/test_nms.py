"""bbox_iou / nms toolkit parity + occlusion .data key aliases."""

import numpy as np

import jax.numpy as jnp

from singleshotpose_tpu.config import data_config_from_options
from singleshotpose_tpu.ops.decode import bbox_iou, bbox_ious, nms


def test_bbox_iou_center_form():
    a = [0.5, 0.5, 0.4, 0.4]
    assert np.isclose(bbox_iou(a, a), 1.0)
    b = [0.9, 0.9, 0.4, 0.4]   # overlaps corner region
    iou = bbox_iou(a, b)
    # intersection = 0 — boxes touch exactly at (0.7, 0.7)
    assert iou == 0.0
    c = [0.7, 0.5, 0.4, 0.4]
    # ix = [0.5..0.7] = 0.2, iy = 0.4 → inter 0.08, union 0.32-0.08=0.24
    assert np.isclose(bbox_iou(a, c), 0.08 / 0.24)


def test_bbox_iou_corner_form():
    a = [0, 0, 2, 2]
    b = [1, 1, 3, 3]
    assert np.isclose(bbox_iou(a, b, x1y1x2y2=True), 1.0 / 7.0)


def test_bbox_ious_vectorized_matches_scalar():
    rng = np.random.RandomState(0)
    b1 = rng.uniform(0.2, 0.8, (20, 4)).astype(np.float32)
    b2 = rng.uniform(0.2, 0.8, (20, 4)).astype(np.float32)
    vec = np.asarray(bbox_ious(jnp.asarray(b1), jnp.asarray(b2)))
    ref = np.array([bbox_iou(b1[i], b2[i]) for i in range(20)])
    np.testing.assert_allclose(vec, ref, rtol=1e-5, atol=1e-7)


def test_nms_suppresses_overlaps():
    # box = [cx, cy, w, h, conf, ...]
    boxes = [
        np.array([0.5, 0.5, 0.2, 0.2, 0.9]),
        np.array([0.51, 0.5, 0.2, 0.2, 0.8]),   # heavy overlap with #0
        np.array([0.1, 0.1, 0.2, 0.2, 0.7]),    # disjoint
    ]
    out = nms(boxes, nms_thresh=0.4)
    assert len(out) == 2
    assert out[0][4] == 0.9 and out[1][4] == 0.7


def test_nms_empty():
    assert nms([], 0.4) == []


def test_data_config_im_width_alias():
    dc = data_config_from_options(
        {"im_width": "640", "im_height": "480", "name": "ape"})
    assert dc.width == 640 and dc.height == 480
