"""Batched PnP (6D pose from 2D–3D correspondences) in pure JAX.

Replaces the reference's per-frame host calls to ``cv2.solvePnP`` +
``cv2.Rodrigues`` (``utils.py:86-100``) so 2D→6D pose recovery stays on
device and vmaps across a whole eval batch.

Pipeline (matches OpenCV's ITERATIVE solver for the n≥6 non-coplanar case):
  1. Hartley-normalized DLT for the full 3×4 projection in K-normalized image
     coordinates (smallest eigenvector of the 12×12 normal matrix),
  2. orthogonal Procrustes projection of the left 3×3 onto SO(3) with
     cheirality (positive-depth) sign fix,
  3. fixed-iteration Levenberg–Marquardt refinement of (axis-angle, t) on the
     reprojection residual.

The pose-net use case is 9 well-spread, non-coplanar points (centroid + 8
box corners), which is DLT's best case; LM then polishes to the same local
optimum OpenCV finds.  Everything is float64-free (f32) and static-shape:
one jit, vmap over batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["pnp", "pnp_batched", "rodrigues", "so3_exp"]


def so3_exp(w: jax.Array) -> jax.Array:
    """Axis-angle (3,) → rotation matrix via Rodrigues' formula.

    Taylor-guarded for small angles so it is jit/grad safe at w=0."""
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(theta2 + 1e-24)
    K = jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    # K@K == w wᵀ - θ² I for a skew matrix; the outer-product form avoids a
    # matmul so the result stays exact-f32 under the TPU's default bf16
    # matmul lowering (a non-orthogonal R breaks downstream geodesic math).
    return (1.0 - b * theta2) * jnp.eye(3) + a * K + b * jnp.outer(w, w)


rodrigues = so3_exp  # cv2 naming alias


def _so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix → axis-angle (3,). Safe near identity."""
    cos = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    v = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    s = jnp.where(theta < 1e-6, 0.5 + theta * theta / 12.0,
                  theta / (2.0 * jnp.sin(theta) + 1e-24))
    return v * s


def _dlt(X: jax.Array, x: jax.Array) -> jax.Array:
    """Direct linear transform for P (3,4) from X (N,3) ↔ x (N,2) normalized
    image points.  Hartley-normalizes both sides for conditioning."""
    N = X.shape[0]
    # 3D normalization: center + isotropic scale to RMS sqrt(3)
    cX = jnp.mean(X, axis=0)
    Xc = X - cX
    sX = jnp.sqrt(3.0) / (jnp.sqrt(jnp.mean(jnp.sum(Xc * Xc, axis=1))) + 1e-12)
    Xn = Xc * sX
    # 2D normalization: center + scale to RMS sqrt(2)
    cx = jnp.mean(x, axis=0)
    xc = x - cx
    sx = jnp.sqrt(2.0) / (jnp.sqrt(jnp.mean(jnp.sum(xc * xc, axis=1))) + 1e-12)
    xn = xc * sx

    zeros = jnp.zeros((N, 4))
    Xh = jnp.concatenate([Xn, jnp.ones((N, 1))], axis=1)      # (N,4)
    r1 = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], axis=1)   # (N,12)
    r2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)                     # (2N,12)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]                                            # smallest eigval
    Pn = p.reshape(3, 4)
    # denormalize: x = T2^-1 Pn T3 X  where T3 normalizes 3D, T2 normalizes 2D
    T2inv = jnp.array([
        [1.0 / sx, 0.0, cx[0]],
        [0.0, 1.0 / sx, cx[1]],
        [0.0, 0.0, 1.0],
    ])
    T3 = jnp.concatenate([
        jnp.concatenate([sX * jnp.eye(3), (-sX * cX)[:, None]], axis=1),
        jnp.array([[0.0, 0.0, 0.0, 1.0]]),
    ], axis=0)
    return T2inv @ Pn @ T3


def _pose_from_P(P: jax.Array, X: jax.Array):
    """Project the DLT 3×4 onto an SE(3) pose with positive mean depth."""
    M = P[:, :3]
    # cheirality: make mean projected depth positive
    depth = X @ M[2, :] + P[2, 3]
    sign = jnp.where(jnp.mean(jnp.sign(depth)) < 0, -1.0, 1.0)
    P = P * sign
    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    R = U @ D @ Vt
    scale = 3.0 / (jnp.sum(S * jnp.array([1.0, 1.0, d])) + 1e-12)
    t = P[:, 3] * scale
    return R, t


def _refine_lm(X: jax.Array, x: jax.Array, R0: jax.Array, t0: jax.Array,
               iters: int = 15):
    """Fixed-iteration Levenberg–Marquardt on (axis-angle, t)."""

    def residual(params):
        w, t = params[:3], params[3:]
        R = so3_exp(w)
        Xc = X @ R.T + t
        z = Xc[:, 2:3]
        proj = Xc[:, :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        return (proj - x).reshape(-1)

    jac = jax.jacfwd(residual)

    def step(carry, _):
        params, lam = carry
        r = residual(params)
        J = jac(params)
        # Damped least-squares step via QR on the stacked system rather than
        # the normal equations: J'J squares the condition number, which in
        # f32 stalls convergence on depth-flat problems (small object, long
        # focal).  QR keeps cond(J) and converges to the f32 noise floor.
        A = jnp.concatenate([J, jnp.sqrt(lam) * jnp.eye(6, dtype=J.dtype)], axis=0)
        b = jnp.concatenate([r, jnp.zeros((6,), r.dtype)])
        Q, R_ = jnp.linalg.qr(A)
        delta = jax.scipy.linalg.solve_triangular(R_, Q.T @ b)
        new_params = params - delta
        new_cost = jnp.sum(residual(new_params) ** 2)
        cost = jnp.sum(r ** 2)
        improved = new_cost < cost
        params = jnp.where(improved, new_params, params)
        lam = jnp.where(improved, lam * 0.3, lam * 5.0)
        lam = jnp.clip(lam, 1e-10, 1e6)
        return (params, lam), None

    w0 = _so3_log(R0)
    init = (jnp.concatenate([w0, t0]), jnp.asarray(1e-4))
    (params, _), _ = jax.lax.scan(step, init, None, length=iters)
    return so3_exp(params[:3]), params[3:]


def _pnp_single(X: jax.Array, pts2d: jax.Array, K: jax.Array, iters: int):
    # All matmuls here are tiny (≤24×12); force full-f32 passes so the TPU's
    # default bf16 matmul lowering doesn't poison the solve (the MXU cost is
    # irrelevant at this size, the accuracy is not).
    with jax.default_matmul_precision("highest"):
        Kinv = jnp.linalg.inv(K)
        uv1 = jnp.concatenate([pts2d, jnp.ones((pts2d.shape[0], 1), pts2d.dtype)], axis=1)
        xn = (uv1 @ Kinv.T)[:, :2]
        P = _dlt(X, xn)
        R0, t0 = _pose_from_P(P, X)
        return _refine_lm(X, xn, R0, t0, iters)


@partial(jax.jit, static_argnames=("iters",))
def pnp(points_3d: jax.Array, points_2d: jax.Array, camera_matrix: jax.Array,
        iters: int = 15):
    """Single-instance PnP: X (N,3), x (N,2) pixels, K (3,3) → (R (3,3), t (3,)).

    Drop-in for the reference's ``pnp`` (``utils.py:86-100``) minus the host
    round-trip; requires N ≥ 6 non-coplanar points (the pose-net always
    supplies 9)."""
    X = jnp.asarray(points_3d, jnp.float32)
    x = jnp.asarray(points_2d, jnp.float32)
    K = jnp.asarray(camera_matrix, jnp.float32)
    return _pnp_single(X, x, K, iters)


@partial(jax.jit, static_argnames=("iters",))
def pnp_batched(points_3d: jax.Array, points_2d: jax.Array,
                camera_matrix: jax.Array, iters: int = 15):
    """Batched PnP: X (N,3) shared, x (B,N,2), K (3,3) → (R (B,3,3), t (B,3))."""
    X = jnp.asarray(points_3d, jnp.float32)
    xs = jnp.asarray(points_2d, jnp.float32)
    K = jnp.asarray(camera_matrix, jnp.float32)
    return jax.vmap(lambda x: _pnp_single(X, x, K, iters))(xs)
