"""Regression tests for driver semantics pinned by code review:
effective loss scales, per-GT-class eval picks, eval-forward caching."""

import numpy as np
import pytest

import jax.numpy as jnp

from singleshotpose_tpu.drivers import _eval_forward, loss_config_from_spec
from singleshotpose_tpu.ops.decode import best_boxes_per_class, decode_grid
from singleshotpose_tpu.zoo import yolo_pose_multi, yolo_pose_single


def test_loss_scales_follow_reference_not_cfg():
    """The reference hard-codes 1/5/1/1 + thresh 0.6 and ignores the cfg's
    noobject_scale=0.1 (region_loss.py:88-91); the driver must match."""
    spec = yolo_pose_single()
    assert spec.region.noobject_scale == pytest.approx(0.1)  # what cfg says
    cfg = loss_config_from_spec(spec, pretrain_num_epochs=15,
                                im_width=640, im_height=480)
    assert cfg.noobject_scale == 1.0       # what the reference actually does
    assert cfg.object_scale == 5.0
    assert cfg.coord_scale == 1.0 and cfg.class_scale == 1.0
    assert cfg.sil_thresh == 0.6

    honored = loss_config_from_spec(spec, pretrain_num_epochs=15,
                                    im_width=640, im_height=480,
                                    honor_cfg_scales=True)
    assert honored.noobject_scale == pytest.approx(0.1)


def test_best_boxes_per_class_matches_per_class_calls():
    from singleshotpose_tpu.ops.decode import best_box_for_class
    K, C, nA, H, W, B = 9, 13, 5, 4, 4, 2
    rng = np.random.RandomState(0)
    out = jnp.asarray(rng.randn(B, H, W, nA * (2 * K + 1 + C)), jnp.float32)
    decoded = decode_grid(out, K, C, nA)
    allc = np.asarray(best_boxes_per_class(decoded, 0.05))
    assert allc.shape == (B, C, 2 * K + 3)
    for c in (0, 3, 12):
        one = np.asarray(best_box_for_class(decoded, c, 0.05))
        np.testing.assert_allclose(allc[:, c], one, rtol=1e-6)


def test_eval_forward_cached_per_spec():
    spec = yolo_pose_single()
    f1 = _eval_forward(spec, jnp.bfloat16)
    f2 = _eval_forward(spec, jnp.bfloat16)
    assert f1 is f2                       # cache hit: no retrace per eval
    f3 = _eval_forward(spec, None)
    assert f3 is not f1                   # distinct per compute dtype
    other = yolo_pose_multi()
    assert _eval_forward(other, jnp.bfloat16) is not f1


def test_multi_gt_test_labels_decode_correctly(tmp_path):
    """Two GTs of different classes in one eval frame: per-row 21-stride
    padding keeps classes/corners aligned (the reference's contiguous
    packing would misread GT 1)."""
    from singleshotpose_tpu.data.pipeline import PoseDataset
    from singleshotpose_tpu.evaluate import gt_corner_boxes, truths_length
    from PIL import Image

    root = tmp_path / "obj"
    for d in ("JPEGImages", "labels"):
        (root / d).mkdir(parents=True)
    img = np.zeros((48, 64, 3), np.uint8)
    Image.fromarray(img).save(root / "JPEGImages" / "000000.png")
    lab = np.zeros((2, 21), np.float32)
    lab[0, 0] = 3
    lab[0, 1:19] = 0.25
    lab[1, 0] = 7
    lab[1, 1:19] = 0.75
    np.savetxt(root / "labels" / "000000.txt", lab)
    lst = tmp_path / "t.txt"
    lst.write_text(str(root / "JPEGImages" / "000000.png") + "\n")

    ds = PoseDataset(str(lst), train=False)
    label = ds.get_test_label(0)
    assert truths_length(label) == 2
    t = label.reshape(50, 21)
    assert t[0, 0] == 3 and t[1, 0] == 7          # classes aligned
    boxes = gt_corner_boxes(label)
    np.testing.assert_allclose(boxes[0], 0.25)
    np.testing.assert_allclose(boxes[1], 0.75)    # corners aligned
    assert (t[:2, 19:21] == 0).all()              # extents zero at eval
