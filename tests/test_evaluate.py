"""Eval harness tests against synthetic poses with known errors."""

import numpy as np
import pytest

from singleshotpose_tpu.evaluate import (
    EvalContext, PoseErrors, accuracy_summary, gt_corner_boxes,
    multi_accuracy_table, pose_metrics, truths_length)
from singleshotpose_tpu.utils.geometry import get_camera_intrinsic


def _random_pose(rng, depth=0.6):
    w = rng.randn(3) * 0.5
    th = np.linalg.norm(w)
    K_ = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    R = np.eye(3) + np.sin(th) / th * K_ + (1 - np.cos(th)) / th ** 2 * K_ @ K_
    t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                  depth + rng.uniform(0, 0.3)])
    return R.astype(np.float32), t.astype(np.float32)


@pytest.fixture(scope="module")
def ctx():
    rng = np.random.RandomState(0)
    # box-corner cloud ~8 cm object + centroid
    corners = np.array([[sx * 0.04, sy * 0.03, sz * 0.05]
                        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                       np.float32)
    pts3d = np.concatenate([np.zeros((1, 3), np.float32), corners])
    verts = rng.uniform(-1, 1, (200, 3)).astype(np.float32) * \
        np.array([0.04, 0.03, 0.05], np.float32)
    vertices = np.concatenate([verts, np.ones((200, 1), np.float32)], 1).T
    K = get_camera_intrinsic(325.2611, 242.0489, 572.4114, 573.5704)
    diam = 2 * np.linalg.norm([0.04, 0.03, 0.05])
    return EvalContext(pts3d, vertices.astype(np.float32),
                       K.astype(np.float32), float(diam), 640, 480)


def _project(pts3d, R, t, K):
    cam = pts3d @ R.T + t
    pix = cam @ K.T
    return (pix[:, :2] / pix[:, 2:3]).astype(np.float32)


def test_identical_poses_zero_error(ctx):
    rng = np.random.RandomState(1)
    B = 4
    gt = []
    for _ in range(B):
        R, t = _random_pose(rng)
        gt.append(_project(ctx.points_3d, R, t, ctx.intrinsics))
    gt = np.stack(gt)
    m = pose_metrics(gt, gt.copy(), ctx)
    assert np.all(m["err_2d"] < 0.1)
    assert np.all(m["err_3d"] < 1e-3)
    assert np.all(m["err_trans"] < 1e-3)
    assert np.all(m["err_angle"] < 0.5)
    assert np.all(m["err_corner2d"] == 0)


def test_perturbed_pose_errors_scale(ctx):
    rng = np.random.RandomState(2)
    R, t = _random_pose(rng)
    gt = _project(ctx.points_3d, R, t, ctx.intrinsics)[None]
    pr = gt + 12.0  # constant 12px shift on every keypoint
    m = pose_metrics(gt, pr, ctx)
    assert np.isclose(m["err_corner2d"][0], 12.0 * np.sqrt(2), rtol=1e-4)
    assert m["err_2d"][0] > 5.0          # well past the 5px threshold
    assert m["err_trans"][0] > 0.005

    errs = PoseErrors()
    errs.extend(pose_metrics(gt, gt.copy(), ctx))
    errs.extend(m)
    s = accuracy_summary(errs, ctx.diam)
    assert s["n_samples"] == 2
    assert 49.0 < s["acc_2d_proj"] < 51.0     # 1 of 2 within 5 px
    assert 49.0 < s["acc_corner_2d"] < 51.0


def test_truths_length_and_gt_boxes():
    K = 9
    row = np.zeros(50 * 21, np.float32)
    t = row.reshape(50, 21)
    t[0, 1:19] = 0.5
    t[1, 1:19] = 0.25
    assert truths_length(row) == 2
    boxes = gt_corner_boxes(row)
    assert boxes.shape == (2, 18)
    assert np.all(boxes[0] == 0.5)


def test_multi_accuracy_table():
    tab = multi_accuracy_table([3.0, 7.0, 12.0, 60.0])
    assert 74.9 < tab[15] < 75.1
    assert 24.9 < tab[5] < 25.1
    assert tab[50] < 75.1
    assert list(tab.keys()) == list(range(5, 55, 5))


def test_box3d_iou():
    from singleshotpose_tpu.evaluate import box3d_iou
    corners = np.array([[sx * .04, sy * .03, sz * .05]
                        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                       np.float32)
    Rt = np.concatenate([np.eye(3), [[0], [0], [0.6]]], axis=1).astype(np.float32)
    # identical pose → IoU 1
    assert box3d_iou(Rt, Rt, corners) == pytest.approx(1.0, abs=1e-6)
    # disjoint (shift by > box size) → 0
    Rt2 = Rt.copy()
    Rt2[0, 3] += 0.2
    assert box3d_iou(Rt, Rt2, corners) == 0.0
    # half-overlap along x: inter = 1/2 vol, union = 3/2 vol → IoU 1/3
    Rt3 = Rt.copy()
    Rt3[0, 3] += 0.04
    assert box3d_iou(Rt, Rt3, corners, grid=40) == pytest.approx(1/3, rel=0.06)


def test_add_s_symmetric_object():
    """symmetric=True scores err_3d as ADD-S (nearest-neighbour distance,
    reference adi utils.py:60-64 — defined there but never called): a pose
    off by exactly the object's symmetry rotation has large index-matched
    ADD but ~zero ADD-S.  Default (symmetric=False) must keep reporting
    plain ADD, the reference's behavior for every object."""
    # vertex set invariant under 45-degree rotation about z: two 8-point
    # rings (radius 5 cm at z = +/-2 cm)
    ang = np.arange(8) * (2 * np.pi / 8)
    ring = np.stack([0.05 * np.cos(ang), 0.05 * np.sin(ang)], 1)
    verts = np.concatenate(
        [np.concatenate([ring, np.full((8, 1), z)], 1) for z in (-.02, .02)]
    ).astype(np.float32)
    vertices = np.concatenate([verts, np.ones((16, 1), np.float32)], 1).T
    from singleshotpose_tpu.utils.geometry import get_3D_corners
    corners3d = get_3D_corners(vertices)[:3].T
    pts3d = np.concatenate([np.zeros((1, 3), np.float32),
                            corners3d]).astype(np.float32)
    K = get_camera_intrinsic(325.2611, 242.0489, 572.4114, 573.5704)
    ctx = EvalContext(pts3d, vertices, K.astype(np.float32), 0.12, 640, 480)

    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    Rz45 = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.array([0.02, -0.01, 0.6], np.float32)
    gt = _project(ctx.points_3d, np.eye(3, dtype=np.float32), t, ctx.intrinsics)[None]
    pr = _project(ctx.points_3d, Rz45, t, ctx.intrinsics)[None]

    m_add = pose_metrics(gt, pr, ctx)
    m_adds = pose_metrics(gt, pr, ctx, symmetric=True)
    # index-matched ADD sees the 45-degree swing of a 5 cm-radius ring
    assert m_add["err_3d"][0] > 0.02
    # ADD-S: the rotated ring lands exactly on itself
    assert m_adds["err_3d"][0] < 2e-3
    # every non-3D error family is untouched by the flag
    for k in ("err_2d", "err_trans", "err_angle", "err_corner2d"):
        np.testing.assert_allclose(m_adds[k], m_add[k], rtol=1e-6)
    # equal poses: ADD-S agrees with ADD at zero
    m0 = pose_metrics(gt, gt.copy(), ctx, symmetric=True)
    assert m0["err_3d"][0] < 1e-3


def test_eval_context_cache(tmp_path):
    """from_data_config caches per (mesh file id, intrinsics, dims): the
    in-training eval cadence re-enters every eval epoch and must not re-pay
    the ASCII PLY parse + O(n^2) diameter; editing the mesh file on disk
    invalidates (mtime/size key)."""
    from singleshotpose_tpu.config import DataConfig

    ply = tmp_path / "m.ply"

    def write_ply(scale):
        verts = [(x * scale, y * scale, z * scale)
                 for x in (0, 1) for y in (0, 1) for z in (0, 1)]
        lines = ["ply", "format ascii 1.0",
                 f"element vertex {len(verts)}",
                 "property float x", "property float y", "property float z",
                 "element face 0",
                 "property list uchar int vertex_indices", "end_header"]
        lines += [f"{x} {y} {z}" for x, y, z in verts]
        ply.write_text("\n".join(lines) + "\n")

    write_ply(0.01)
    dcfg = DataConfig(mesh=str(ply))
    c1 = EvalContext.from_data_config(dcfg)
    c2 = EvalContext.from_data_config(dcfg)
    assert c2 is c1                      # cache hit, same object
    assert EvalContext.from_data_config(
        dcfg, use_cfg_diam=True) is not c1   # different key

    import os as _os
    write_ply(0.02)                      # bigger object
    st = _os.stat(ply)
    _os.utime(ply, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    c3 = EvalContext.from_data_config(dcfg)
    assert c3 is not c1
    assert c3.diam > c1.diam * 1.5       # rebuilt from the new file
