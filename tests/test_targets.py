import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from singleshotpose_tpu.ops.losses import RegionLossConfig, activate_head, region_loss
from singleshotpose_tpu.ops.targets import build_targets

REF_DIR = "/root/reference"
REF_MULTI_DIR = "/root/reference/multi_obj_pose_estimation"


def make_target(gts, num_keypoints=9, max_num_gt=50):
    """gts: list per batch of list of 21-float labels."""
    nl = 2 * num_keypoints + 3
    B = len(gts)
    t = np.zeros((B, max_num_gt * nl), np.float32)
    for b, objs in enumerate(gts):
        for i, obj in enumerate(objs):
            t[b, i * nl:(i + 1) * nl] = obj
    return t


def random_label(rng, cls=0.0):
    lab = np.zeros(21, np.float32)
    lab[0] = cls
    lab[1] = rng.uniform(0.05, 0.95)   # centroid x (nonzero => valid)
    lab[2] = rng.uniform(0.05, 0.95)
    lab[3:19] = (lab[1:3].tolist() * 8 + rng.randn(16) * 0.05)
    lab[19] = rng.uniform(0.1, 0.4)
    lab[20] = rng.uniform(0.1, 0.4)
    return lab


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference absent")
def test_build_targets_matches_reference_single(reference_dir):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    B, K, nH, nW = 3, 9, 13, 13
    S = nH * nW
    pred = rng.rand(B, S, 2 * K).astype(np.float32)
    # exactly one target per image: the reference's single-object
    # build_targets only runs under modern torch for the 1-GT case (its
    # view_as/flat-mask indexing relied on torch-0.4 laxness); LINEMOD is
    # single-object anyway. Multi-GT and empty-image behavior are covered by
    # the dedicated unit tests below.
    target = make_target([
        [random_label(rng)],
        [random_label(rng)],
        [random_label(rng)],
    ])

    sys.path.insert(0, reference_dir)
    try:
        import importlib
        ref_rl = importlib.import_module("region_loss")
        res = ref_rl.build_targets(
            torch.from_numpy(pred.reshape(B * S, 2 * K)),
            torch.from_numpy(target), K, 1, 1, nH, nW, 1.0, 5.0, 0.6, 0)
    finally:
        sys.path.remove(reference_dir)
    nGT, nCorrect, coord_mask, conf_mask, cls_mask, txs, tys, tconf, tcls = res

    bt = build_targets(jnp.asarray(pred), jnp.asarray(target),
                       num_keypoints=K, num_anchors=1, nH=nH, nW=nW,
                       noobject_scale=1.0, object_scale=5.0, sil_thresh=0.6)

    assert int(bt.num_gt) == nGT
    assert int(bt.num_correct) == nCorrect
    np.testing.assert_allclose(np.asarray(bt.coord_mask).reshape(B, 1, nH, nW),
                               coord_mask.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bt.conf_mask).reshape(B, 1, nH, nW),
                               conf_mask.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bt.tconf).reshape(B, 1, nH, nW),
                               tconf.numpy(), atol=1e-4)
    for i in range(K):
        np.testing.assert_allclose(np.asarray(bt.txs[..., i]).reshape(B, 1, nH, nW),
                                   txs[i].numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(bt.tys[..., i]).reshape(B, 1, nH, nW),
                                   tys[i].numpy(), atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF_MULTI_DIR), reason="reference absent")
def test_build_targets_matches_reference_multi_masks(reference_dir):
    """Multi-anchor variant: masks/offsets/classes must match; tconf is NOT
    compared (the reference reads the rescoring cell with best_n=-1 before
    anchor selection — region_loss_multi.py:51,63 — a bug we do not copy)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    B, K, nA, nC, nH, nW = 2, 9, 5, 13, 13, 13
    S = nA * nH * nW
    anchors = [1.4820, 2.2412, 2.0501, 3.1265, 2.3946, 4.6891, 3.1018, 3.9910,
               3.4879, 5.8851]
    pred = rng.rand(B, S, 2 * K).astype(np.float32)
    target = make_target([
        [random_label(rng, cls=3.0), random_label(rng, cls=7.0)],
        [random_label(rng, cls=0.0)],
    ])

    sys.path.insert(0, REF_MULTI_DIR)
    sys.path.insert(0, reference_dir)
    try:
        import importlib
        ref_rlm = importlib.import_module("region_loss_multi")
        res = ref_rlm.build_targets(
            torch.from_numpy(pred.reshape(B * S, 2 * K)),
            torch.from_numpy(target), K, anchors, nA, nC, nH, nW,
            1.0, 5.0, 0.6, 0)
    finally:
        sys.path.remove(reference_dir)
        sys.path.remove(REF_MULTI_DIR)
    nGT, _, coord_mask, conf_mask, cls_mask, txs, tys, tconf, tcls = res

    bt = build_targets(jnp.asarray(pred), jnp.asarray(target),
                       num_keypoints=K, num_anchors=nA, nH=nH, nW=nW,
                       noobject_scale=1.0, object_scale=5.0, sil_thresh=0.6,
                       anchors=tuple(anchors))
    assert int(bt.num_gt) == nGT
    np.testing.assert_allclose(np.asarray(bt.coord_mask).reshape(B, nA, nH, nW),
                               coord_mask.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bt.conf_mask).reshape(B, nA, nH, nW),
                               conf_mask.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bt.cls_mask).reshape(B, nA, nH, nW),
                               cls_mask.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bt.tcls * bt.cls_mask).reshape(B, nA, nH, nW),
        tcls.numpy(), atol=1e-6)
    for i in range(K):
        np.testing.assert_allclose(np.asarray(bt.txs[..., i]).reshape(B, nA, nH, nW),
                                   txs[i].numpy(), atol=1e-4)


def test_last_writer_wins_on_cell_collision():
    rng = np.random.RandomState(2)
    K, nH, nW = 9, 4, 4
    a = random_label(rng, cls=1.0)
    b = a.copy()
    b[0] = 2.0
    b[3:19] += 0.01  # same centroid cell, different corners/class
    target = make_target([[a, b]])
    pred = rng.rand(1, nH * nW, 2 * K).astype(np.float32)
    bt = build_targets(jnp.asarray(pred), jnp.asarray(target),
                       num_keypoints=K, num_anchors=1, nH=nH, nW=nW,
                       noobject_scale=1.0, object_scale=5.0, sil_thresh=0.6)
    gi0 = int(a[1] * nW)
    gj0 = int(a[2] * nH)
    cell = gj0 * nW + gi0
    assert int(bt.tcls[0, cell]) == 2  # the later GT won
    assert int(bt.num_gt) == 2


def test_break_semantics_ignores_after_gap():
    rng = np.random.RandomState(3)
    K, nH, nW = 9, 4, 4
    lab = random_label(rng)
    nl = 21
    t = np.zeros((1, 50 * nl), np.float32)
    # slot 0 valid, slot 1 empty, slot 2 would be valid but must be ignored
    t[0, 0:nl] = lab
    t[0, 2 * nl:3 * nl] = random_label(rng)
    pred = rng.rand(1, nH * nW, 2 * K).astype(np.float32)
    bt = build_targets(jnp.asarray(pred), jnp.asarray(t),
                       num_keypoints=K, num_anchors=1, nH=nH, nW=nW,
                       noobject_scale=1.0, object_scale=5.0, sil_thresh=0.6)
    assert int(bt.num_gt) == 1


def test_region_loss_values_tiny_grid():
    """Hand-checkable loss on a 1-cell grid with one GT."""
    K, C, nA, H, W = 9, 1, 1, 1, 1
    rng = np.random.RandomState(4)
    out = np.zeros((1, H, W, 2 * K + 1 + C), np.float32)
    lab = np.zeros(21, np.float32)
    lab[1:19] = 0.5  # all keypoints at cell center
    target = make_target([[lab]])

    loss, stats = region_loss(jnp.asarray(out), jnp.asarray(target),
                              epoch=100, cfg=RegionLossConfig.single())
    # predicted x0=sigmoid(0)=0.5 -> matches tx=0.5 => no loss from keypoint 0
    # corners raw 0.0 vs target 0.5 offsets -> each contributes 0.5*0.25
    expected_xy = 2 * (8 * 0.5 * 0.25)  # x and y, 8 corner keypoints each
    # conf: pred sigmoid(0)=0.5; tconf = corner confidence of pred vs gt
    xs, ys, conf, _, pred_corners = activate_head(jnp.asarray(out), K, C, nA)
    from singleshotpose_tpu.ops.confidence import corner_confidences
    tconf = float(corner_confidences(jnp.asarray(lab[1:19]), pred_corners[0, 0]))
    expected_conf = 0.5 * 5.0 * (0.5 - tconf) ** 2
    np.testing.assert_allclose(float(stats["loss_x"] + stats["loss_y"]),
                               expected_xy, rtol=1e-5)
    np.testing.assert_allclose(float(stats["loss_conf"]), expected_conf, rtol=1e-4)
    np.testing.assert_allclose(float(loss),
                               expected_xy + expected_conf, rtol=1e-4)
    # pretrain gating drops the confidence term
    loss_pre, _ = region_loss(jnp.asarray(out), jnp.asarray(target),
                              epoch=0, cfg=RegionLossConfig.single())
    np.testing.assert_allclose(float(loss_pre), expected_xy, rtol=1e-5)


def test_region_loss_multi_class_term():
    K, C, nA, H, W = 9, 3, 2, 2, 2
    rng = np.random.RandomState(5)
    out = rng.randn(1, H, W, nA * (2 * K + 1 + C)).astype(np.float32) * 0.1
    lab = random_label(rng, cls=2.0)
    target = make_target([[lab]])
    cfg = RegionLossConfig.multi(anchors=(1.0, 1.0, 3.0, 3.0),
                                 num_classes=C, num_anchors=nA)
    loss, stats = region_loss(jnp.asarray(out), jnp.asarray(target),
                              epoch=100, cfg=cfg)
    assert float(stats["loss_cls"]) > 0
    assert np.isfinite(float(loss))
    # gradient flows
    import jax
    g = jax.grad(lambda o: region_loss(o, jnp.asarray(target), 100, cfg)[0])(
        jnp.asarray(out))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
