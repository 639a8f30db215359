"""ssp make-labels: the reference's label_file_creation.md recipe as a tool.

Round-trip checks: rows must reproject exactly (modulo the 6-decimal file
format), the corner order must match ``get_3D_corners``, and — the real
contract — the written labels must be good enough ground truth that the
framework's own PnP recovers the generating pose from them.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from singleshotpose_tpu.make_labels import (label_rows_for_poses,
                                            write_label_files)
from singleshotpose_tpu.utils.geometry import (get_3D_corners,
                                               compute_projection)

K = np.array([[572.4114, 0, 325.2611],
              [0, 573.5704, 242.0489],
              [0, 0, 1]], np.float64)
W, H = 640, 480


def _random_poses(n, seed=0):
    rng = np.random.RandomState(seed)
    Rs, ts = [], []
    for _ in range(n):
        w = rng.randn(3)
        th = np.linalg.norm(w)
        Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                       [-w[1], w[0], 0]]) / th
        Rs.append(np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx)
        ts.append([rng.uniform(-.05, .05), rng.uniform(-.04, .04),
                   rng.uniform(.6, 1.2)])
    return np.array(Rs), np.array(ts)


def _box_vertices():
    return np.array([[sx * .04, sy * .03, sz * .05]
                     for sx in (-1, 1) for sy in (-1, 1)
                     for sz in (-1, 1)], np.float64)


def test_rows_match_direct_projection():
    v = _box_vertices()
    R, t = _random_poses(5)
    rows = label_rows_for_poses(v, R, t, K, W, H)
    assert rows.shape == (5, 21)
    corners = get_3D_corners(np.vstack([v.T, np.ones((1, len(v)))]))
    pts = np.concatenate([[[0], [0], [0], [1]]], axis=1)
    pts = np.concatenate([np.array([[0.], [0.], [0.], [1.]]), corners], 1)
    for i in range(5):
        Rt = np.concatenate([R[i], t[i][:, None]], 1)
        uv = compute_projection(pts, Rt, K)
        np.testing.assert_allclose(
            rows[i, 1:19].reshape(9, 2),
            (uv / np.array([[W], [H]])).T, atol=1e-12)
        assert rows[i, 19] == pytest.approx(
            (uv[0].max() - uv[0].min()) / W)
        assert rows[i, 20] == pytest.approx(
            (uv[1].max() - uv[1].min()) / H)
        assert rows[i, 0] == 0


def test_vertex_layout_and_per_frame_K():
    v = _box_vertices()
    R, t = _random_poses(3, seed=1)
    base = label_rows_for_poses(v, R, t, K, W, H, class_id=7)
    assert (base[:, 0] == 7).all()
    # (3, N) vertex layout must give identical rows
    np.testing.assert_array_equal(
        base, label_rows_for_poses(v.T, R, t, K, W, H, class_id=7))
    # per-frame K stack, one frame scaled: only that frame's row moves
    Ks = np.stack([K, K * np.array([[1.1], [1.1], [1.0]]), K])
    rows = label_rows_for_poses(v, R, t, Ks, W, H, class_id=7)
    np.testing.assert_array_equal(rows[0], base[0])
    assert not np.allclose(rows[1, 1:], base[1, 1:])
    np.testing.assert_array_equal(rows[2], base[2])


def test_pnp_recovers_pose_from_written_labels(tmp_path):
    """The end contract: labels written by the tool are valid 2D-3D ground
    truth — the framework's own PnP recovers the generating pose."""
    from singleshotpose_tpu.ops.pnp import pnp_batched

    v = _box_vertices()
    R, t = _random_poses(4, seed=2)
    rows = label_rows_for_poses(v, R, t, K, W, H)
    paths = write_label_files(rows, str(tmp_path / "labels"))
    assert len(paths) == 4 and paths[0].endswith("000000.txt")

    corners = get_3D_corners(np.vstack([v.T, np.ones((1, len(v)))]))
    pts3d = np.concatenate([np.zeros((3, 1)), corners[:3]], 1).T  # (9, 3)
    read = np.array([np.loadtxt(p) for p in paths])
    uv = read[:, 1:19].reshape(-1, 9, 2) * np.array([W, H], np.float64)
    Rp, tp = pnp_batched(pts3d, uv, K)
    np.testing.assert_allclose(np.asarray(Rp), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tp).reshape(4, 3), t, atol=1e-3)


def test_cli_make_labels(tmp_path):
    v = _box_vertices()
    ply = ["ply", "format ascii 1.0", f"element vertex {len(v)}",
           "property float x", "property float y", "property float z",
           "element face 0", "property list uchar int vertex_indices",
           "end_header"] + [f"{a} {b} {c}" for a, b, c in v]
    mesh = tmp_path / "obj.ply"
    mesh.write_text("\n".join(ply) + "\n")
    R, t = _random_poses(3, seed=3)
    poses = tmp_path / "poses.npz"
    np.savez(poses, R=R, t=t, K=K, width=W, height=H,
             names=np.array(["0001", "0002.jpg", "0003"]))
    out = tmp_path / "labels"
    r = subprocess.run(
        [sys.executable, "-m", "singleshotpose_tpu.cli", "make-labels",
         "--mesh", str(mesh), "--poses", str(poses), "--out", str(out)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    assert sorted(os.listdir(out)) == ["0001.txt", "0002.txt", "0003.txt"]
    got = np.loadtxt(out / "0001.txt")
    want = label_rows_for_poses(v, R, t, K, W, H)[0]
    np.testing.assert_allclose(got, want, atol=1e-6)
