import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from singleshotpose_tpu.ops.confidence import corner_confidences
from singleshotpose_tpu.utils import geometry as G
from singleshotpose_tpu.utils.meshply import MeshPly

REF_DIR = "/root/reference"


def test_camera_intrinsic():
    K = G.get_camera_intrinsic(325.0, 242.0, 572.0, 573.0)
    assert K[0, 0] == 572.0 and K[1, 1] == 573.0
    assert K[0, 2] == 325.0 and K[1, 2] == 242.0
    assert K[2, 2] == 1.0


def test_3d_corners_ordering():
    rng = np.random.RandomState(0)
    v = rng.randn(3, 100)
    c = G.get_3D_corners(v)
    assert c.shape == (4, 8)
    assert np.all(c[3] == 1.0)
    # z varies fastest, then y, then x
    assert c[0, 0] == c[0, 1] == c[0, 2] == c[0, 3] == v[0].min()
    assert c[0, 4] == c[0, 5] == c[0, 6] == c[0, 7] == v[0].max()
    assert c[2, 0] == v[2].min() and c[2, 1] == v[2].max()


def test_projection_roundtrip():
    K = G.get_camera_intrinsic(320, 240, 500, 500)
    X = np.concatenate([np.random.RandomState(1).randn(3, 10) * 0.05,
                        np.ones((1, 10))], axis=0)
    Rt = np.concatenate([np.eye(3), np.array([[0.0], [0.0], [1.0]])], axis=1)
    p = G.compute_projection(X, Rt, K)
    assert p.shape == (2, 10)
    # point at origin projects to principal point
    X0 = np.array([[0.0], [0.0], [0.0], [1.0]])
    p0 = G.compute_projection(X0, Rt, K)
    np.testing.assert_allclose(p0.ravel(), [320, 240])


def test_angular_distance():
    assert G.calc_angular_distance(np.eye(3), np.eye(3)) == pytest.approx(0.0)
    Rz90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    assert G.calc_angular_distance(np.eye(3), Rz90) == pytest.approx(90.0)


def test_diameter_blocked_vs_bruteforce():
    rng = np.random.RandomState(2)
    pts = rng.randn(300, 3)
    d = G.calc_pts_diameter(pts, chunk=64)
    brute = 0.0
    for i in range(300):
        brute = max(brute, float(np.sqrt(((pts[i] - pts) ** 2).sum(1)).max()))
    assert d == pytest.approx(brute)


def test_adi_zero_for_identical():
    pts = np.random.RandomState(3).randn(50, 3)
    assert G.adi(pts, pts) == pytest.approx(0.0)


def test_fix_corner_order():
    c = np.arange(18, dtype=np.float32).reshape(9, 2)
    f = G.fix_corner_order(c)
    np.testing.assert_array_equal(f[2], c[3])
    np.testing.assert_array_equal(f[5], c[2])
    np.testing.assert_array_equal(f[8], c[8])


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference absent")
def test_corner_confidences_match_reference(reference_dir):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(4)
    nA = 32
    gt = rng.rand(18).astype(np.float32)
    pr = (gt[None, :] + rng.randn(nA, 18).astype(np.float32) * 0.05)

    sys.path.insert(0, reference_dir)
    try:
        import importlib
        ref_utils = importlib.import_module("utils")
        # reference batched variant takes (2K, nA) tensors
        ref = ref_utils.corner_confidences(
            torch.from_numpy(np.tile(gt[:, None], (1, nA))),
            torch.from_numpy(pr.T.copy())).numpy()
    finally:
        sys.path.remove(reference_dir)

    ours = np.asarray(corner_confidences(jnp.asarray(gt)[None, :], jnp.asarray(pr)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_corner_confidence_perfect_and_far():
    gt = jnp.asarray(np.full((18,), 0.5, np.float32))
    assert float(corner_confidences(gt, gt)) == pytest.approx(1.0, abs=1e-4)
    far = gt + 1.0  # 640px away >> 80px threshold
    assert float(corner_confidences(gt, far)) == 0.0


def test_meshply_reader(tmp_path):
    ply = tmp_path / "box.ply"
    ply.write_text("""ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
""")
    mesh = MeshPly(str(ply))
    assert len(mesh.vertices) == 3
    assert mesh.vertices[1] == [1.0, 0.0, 0.0]
    assert len(mesh.indices) == 1
    hv = mesh.homogeneous_vertices()
    assert hv.shape == (4, 3)
    assert np.all(hv[3] == 1.0)
