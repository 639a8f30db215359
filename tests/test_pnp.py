import numpy as np
import pytest

from singleshotpose_tpu.ops.pnp import pnp, pnp_batched, so3_exp
from singleshotpose_tpu.utils.geometry import (
    calc_angular_distance,
    get_camera_intrinsic,
)

K = get_camera_intrinsic(325.2611, 242.0489, 572.4114, 573.5704)


def random_pose(rng):
    w = rng.randn(3) * 0.8
    R = np.asarray(so3_exp(w.astype(np.float32)))
    t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                  rng.uniform(0.5, 1.5)])
    return R, t


def box_points(rng, scale=0.1):
    """Centroid + 8 corners of a random box — the pose-net 3D point set."""
    ext = rng.uniform(0.3, 1.0, size=3) * scale
    corners = np.array([[sx, sy, sz] for sx in (-ext[0], ext[0])
                        for sy in (-ext[1], ext[1])
                        for sz in (-ext[2], ext[2])])
    return np.concatenate([np.zeros((1, 3)), corners], axis=0)


def project(X, R, t):
    Xc = X @ R.T + t
    uvw = Xc @ K.T
    return uvw[:, :2] / uvw[:, 2:3]


def test_pnp_recovers_exact_pose():
    rng = np.random.RandomState(0)
    for _ in range(10):
        R, t = random_pose(rng)
        X = box_points(rng)
        x = project(X, R, t)
        R_est, t_est = pnp(X.astype(np.float32), x.astype(np.float32), K)
        ang = float(calc_angular_distance(R, np.asarray(R_est, np.float64)))
        assert ang < 0.05, ang
        assert np.linalg.norm(np.asarray(t_est) - t) < 1e-3


def test_pnp_noisy_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    angs, tds = [], []
    for _ in range(10):
        R, t = random_pose(rng)
        X = box_points(rng)
        x = project(X, R, t) + rng.randn(9, 2) * 2.0  # 2px noise
        R_est, t_est = pnp(X.astype(np.float32), x.astype(np.float32), K)
        _, rvec, tvec = cv2.solvePnP(
            X.astype(np.float32),
            np.ascontiguousarray(x[:, :2].astype(np.float32)).reshape(-1, 1, 2),
            K.astype(np.float32), np.zeros((8, 1), np.float32))
        R_cv, _ = cv2.Rodrigues(rvec)
        ang = float(calc_angular_distance(np.asarray(R_est, np.float64), R_cv))
        td = np.linalg.norm(np.asarray(t_est) - tvec.ravel())
        angs.append(ang)
        tds.append(td)
    # both solvers land on the same optimum for clean-ish data
    assert np.median(angs) < 0.5, angs
    assert np.median(tds) < 5e-3, tds


def test_pnp_batched_matches_single():
    rng = np.random.RandomState(2)
    X = box_points(rng)
    xs = []
    poses = []
    for _ in range(4):
        R, t = random_pose(rng)
        poses.append((R, t))
        xs.append(project(X, R, t))
    xs = np.stack(xs).astype(np.float32)
    Rb, tb = pnp_batched(X.astype(np.float32), xs, K)
    for i, (R, t) in enumerate(poses):
        ang = float(calc_angular_distance(R, np.asarray(Rb[i], np.float64)))
        assert ang < 0.05
        assert np.linalg.norm(np.asarray(tb[i]) - t) < 1e-3


def test_so3_exp_identity_and_known():
    np.testing.assert_allclose(np.asarray(so3_exp(np.zeros(3, np.float32))),
                               np.eye(3), atol=1e-6)
    # 90 deg about z
    Rz = np.asarray(so3_exp(np.array([0, 0, np.pi / 2], np.float32)))
    np.testing.assert_allclose(Rz, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-5)
