import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from singleshotpose_tpu.ops.decode import (
    best_box_for_class,
    best_boxes,
    decode_grid,
    multi_region_boxes_np,
)

REF_DIR = "/root/reference"


def rand_head(rng, B=2, H=13, W=13, K=9, C=1, nA=1):
    return rng.randn(B, H, W, nA * (2 * K + 1 + C)).astype(np.float32)


def test_decode_grid_shapes():
    rng = np.random.RandomState(0)
    out = rand_head(rng)
    d = decode_grid(jnp.asarray(out), 9, 1, 1)
    assert d.corners.shape == (2, 169, 18)
    assert d.det_conf.shape == (2, 169)
    assert d.cls_probs.shape == (2, 169, 1)


def test_decode_grid_centroid_in_cell():
    """Centroid coords are sigmoid + grid, so every centroid must lie inside
    its own cell; corner keypoints are unconstrained."""
    rng = np.random.RandomState(1)
    out = rand_head(rng, B=1, H=4, W=4)
    d = decode_grid(jnp.asarray(out), 9, 1, 1)
    cx = np.asarray(d.corners[0, :, 0]) * 4  # grid units
    cells = np.arange(16) % 4
    assert np.all(cx >= cells) and np.all(cx <= cells + 1)


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference absent")
def test_best_boxes_matches_reference_get_region_boxes(reference_dir):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    out_nhwc = rand_head(rng, B=1, H=13, W=13)
    out_nchw = torch.from_numpy(out_nhwc.transpose(0, 3, 1, 2)).contiguous()

    sys.path.insert(0, reference_dir)
    try:
        # get_region_boxes calls .cuda() on grid tensors; patch torch for CPU
        orig = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            import importlib
            ref_utils = importlib.import_module("utils")
            ref_box = ref_utils.get_region_boxes(out_nchw, 1, 9)
        finally:
            torch.Tensor.cuda = orig
    finally:
        sys.path.remove(reference_dir)

    d = decode_grid(jnp.asarray(out_nhwc), 9, 1, 1)
    ours = np.asarray(best_boxes(d))[0]
    ref = np.array([float(v) for v in ref_box], dtype=np.float32)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_best_box_for_class_fallback_and_keep():
    """When boxes of the class survive the threshold, the highest det_conf one
    wins; when none do, the sequential joint-max fallback is used."""
    K, C, nA, H, W = 9, 3, 1, 2, 2
    rng = np.random.RandomState(5)
    out = rng.randn(1, H, W, nA * (2 * K + 1 + C)).astype(np.float32) * 0.01
    # cell 0: strong conf, class 1; cell 3: weaker conf, class 2
    out[0, 0, 0, 2 * K] = 4.0       # det sigmoid ~0.98
    out[0, 0, 0, 2 * K + 1 + 1] = 5.0  # class 1 dominates
    out[0, 1, 1, 2 * K] = 2.0       # det sigmoid ~0.88
    out[0, 1, 1, 2 * K + 1 + 2] = 5.0  # class 2 dominates
    d = decode_grid(jnp.asarray(out), K, C, nA)

    box1 = np.asarray(best_box_for_class(d, 1, conf_thresh=0.1))[0]
    assert int(box1[-1]) == 1
    assert box1[2 * K] > 0.95  # picked cell 0

    box2 = np.asarray(best_box_for_class(d, 2, conf_thresh=0.1))[0]
    assert int(box2[-1]) == 2
    assert 0.8 < box2[2 * K] < 0.95  # picked cell 3

    # class 0 never dominant anywhere above threshold -> fallback path
    box0 = np.asarray(best_box_for_class(d, 0, conf_thresh=0.1))[0]
    assert int(box0[-1]) == 0
    assert np.isfinite(box0).all()

    # host-side toolkit agrees on the fallback presence
    all_boxes = multi_region_boxes_np(d, conf_thresh=0.1, correspondingclass=0,
                                      only_objectness=False)
    cls_ids = [int(b[-1]) for b in all_boxes[0]]
    assert 0 in cls_ids


def test_multi_region_boxes_threshold():
    K, C, nA = 9, 2, 2
    rng = np.random.RandomState(6)
    out = rng.randn(2, 3, 3, nA * (2 * K + 1 + C)).astype(np.float32) * 0.01
    d = decode_grid(jnp.asarray(out), K, C, nA)
    boxes = multi_region_boxes_np(d, conf_thresh=0.9, correspondingclass=0)
    # nothing crosses 0.9 at near-zero logits -> exactly the fallback box each
    assert all(len(bs) == 1 for bs in boxes)
