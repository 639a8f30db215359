"""A/B parity against the reference's own implementations (run CPU-side):
multi-object decode vs ``get_multi_region_boxes`` and JAX PnP vs
``cv2.solvePnP`` (the exact function the reference evaluates with)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

ANCHORS = [1.4820, 2.2412, 2.0501, 3.1265, 2.3946, 4.6891, 3.1018, 3.9910,
           3.4879, 5.8851]


@pytest.fixture
def ref_utils_multi(reference_dir, monkeypatch):
    torch = pytest.importorskip("torch")
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    monkeypatch.syspath_prepend(
        os.path.join(reference_dir, "multi_obj_pose_estimation"))
    sys.modules.pop("utils_multi", None)
    import utils_multi
    yield utils_multi
    sys.modules.pop("utils_multi", None)


def test_multi_decode_matches_reference(ref_utils_multi):
    torch = pytest.importorskip("torch")
    from singleshotpose_tpu.ops.decode import (best_box_for_class,
                                               decode_grid,
                                               multi_region_boxes_np)
    K, C, nA, H, W = 9, 13, 5, 4, 4
    B = 2
    cls_of_interest = 3
    rng = np.random.RandomState(0)
    out_nhwc = rng.randn(B, H, W, nA * (2 * K + 1 + C)).astype(np.float32)
    out_nchw = torch.from_numpy(
        out_nhwc.transpose(0, 3, 1, 2).copy())

    ref_boxes = ref_utils_multi.get_multi_region_boxes(
        out_nchw, 0.05, C, K, ANCHORS, nA, cls_of_interest,
        only_objectness=0)

    decoded = decode_grid(jnp.asarray(out_nhwc), K, C, nA)
    ours = multi_region_boxes_np(decoded, 0.05, cls_of_interest,
                                 only_objectness=False)

    for b in range(B):
        ref_b = np.array([[float(v) for v in box] for box in ref_boxes[b]])
        our_b = np.array(ours[b])
        assert ref_b.shape == our_b.shape, (b, ref_b.shape, our_b.shape)
        # same box set: sort both by det_conf column
        ref_b = ref_b[np.argsort(ref_b[:, 2 * K])]
        our_b = our_b[np.argsort(our_b[:, 2 * K])]
        np.testing.assert_allclose(our_b, ref_b, rtol=2e-4, atol=2e-5)

    # the eval pick (max det_conf of the requested class) matches too
    pick = np.asarray(best_box_for_class(decoded, cls_of_interest, 0.05))
    for b in range(B):
        cand = [np.array([float(v) for v in box]) for box in ref_boxes[b]
                if int(box[2 * K + 2]) == cls_of_interest]
        best = max(cand, key=lambda bx: bx[2 * K])
        np.testing.assert_allclose(pick[b][:2 * K], best[:2 * K],
                                   rtol=2e-4, atol=2e-5)


def _random_pose(rng):
    w = rng.randn(3) * 0.6
    th = np.linalg.norm(w)
    Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    R = np.eye(3) + np.sin(th) / th * Kx + (1 - np.cos(th)) / th ** 2 * Kx @ Kx
    t = np.array([rng.uniform(-.08, .08), rng.uniform(-.08, .08),
                  rng.uniform(0.5, 1.2)])
    return R.astype(np.float32), t.astype(np.float32)


def test_pnp_matches_cv2_solvepnp():
    cv2 = pytest.importorskip("cv2")
    from singleshotpose_tpu.ops.pnp import pnp

    rng = np.random.RandomState(1)
    K = np.array([[572.4114, 0, 325.2611], [0, 573.5704, 242.0489],
                  [0, 0, 1]], np.float32)
    pts3d = np.array([[0, 0, 0]] + [[sx * .04, sy * .03, sz * .05]
                     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                     np.float32)
    for trial in range(8):
        R_true, t_true = _random_pose(rng)
        cam = pts3d @ R_true.T + t_true
        pix = cam @ K.T
        pix = (pix[:, :2] / pix[:, 2:3]).astype(np.float32)
        pix_noisy = pix + rng.randn(*pix.shape).astype(np.float32) * 0.5

        # reference solver (utils.py:86-100): cv2.solvePnP + Rodrigues
        dist = np.zeros((8, 1), np.float32)
        _, rvec, tvec = cv2.solvePnP(pts3d, pix_noisy.reshape(-1, 1, 2), K,
                                     dist)
        R_cv, _ = cv2.Rodrigues(rvec)
        t_cv = tvec.reshape(3)

        R_j, t_j = pnp(pts3d, pix_noisy, K)
        R_j, t_j = np.asarray(R_j), np.asarray(t_j)

        # both should land on the same optimum: tight agreement
        assert np.abs(t_j - t_cv).max() < 2e-3, (trial, t_j, t_cv)
        cos = (np.trace(R_j @ R_cv.T) - 1) / 2
        angle_deg = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert angle_deg < 0.2, (trial, angle_deg)
        # and both near the ground truth (depth is the weakly-constrained
        # axis: 0.5 px noise at f≈572 on an 8 cm object ⇒ ~1% depth σ)
        assert np.abs(t_j - t_true).max() < 0.02 * t_true[2], (trial, t_j,
                                                               t_true)
