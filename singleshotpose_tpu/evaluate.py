"""Evaluation harness: the reference's full 6D-pose metric suite, batched.

Rebuild of ``valid.py:15-233`` (single-object) and ``valid_multi.py:20-158``
(multi-object OCCLUSION) with a TPU-first dataflow: batched forward, on-device
decode, *batched* JAX PnP over every frame at once, then vectorized error
computation — instead of the reference's bs=1 loop with per-frame host
``cv2.solvePnP``.

Metric definitions preserved exactly (``valid.py:203-209``):
  * 2D reprojection: mean pixel distance of ALL mesh vertices projected under
    gt vs pred pose; accuracy = % of frames ≤ 5 px,
  * ADD / 3D transform: mean 3D vertex distance; accuracy = % ≤ 0.1·diameter,
  * 5 cm 5°: translation err ≤ 0.05 m AND geodesic angle ≤ 5°,
  * corner: mean 2D distance of the 9 predicted vs gt keypoints (≤ 5 px),
with the reference's ``len(...)*100/(n+1e-5)`` accuracy convention.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Sequence

import numpy as np

from .config import DataConfig
from .ops.pnp import pnp_batched
from .utils.geometry import (calc_pts_diameter, fix_corner_order,
                             get_3D_corners, get_camera_intrinsic)
from .utils.meshply import MeshPly

__all__ = ["EvalContext", "PoseErrors", "pose_metrics", "accuracy_summary",
           "truths_length", "gt_corner_boxes"]

EPS = 1e-5
PX_THRESHOLD = 5.0

# EvalContext cache (see EvalContext.from_data_config)
_CTX_CACHE: Dict = {}


@dataclasses.dataclass
class EvalContext:
    """Per-object evaluation constants (mesh, intrinsics, diameter)."""
    points_3d: np.ndarray     # (9,3): centroid + 8 bbox corners
    vertices: np.ndarray      # (4,N) homogeneous mesh vertices
    intrinsics: np.ndarray    # (3,3)
    diam: float
    im_width: int
    im_height: int

    @classmethod
    def from_data_config(cls, dcfg: DataConfig, *,
                         use_cfg_diam: bool = False) -> "EvalContext":
        """``use_cfg_diam=False`` recomputes the diameter from mesh vertices —
        what the reference *actually* does (its ``options['diam']`` read is a
        dead NameError branch, ``valid.py:69-72``).

        Cached per (mesh file + mtime/size + intrinsics + image dims): the
        in-training eval cadence calls this every eval epoch, and for real
        LINEMOD meshes the ASCII PLY parse plus the O(n²) diameter are
        host-seconds the repeated evals should not re-pay (reference
        re-reads too, ``valid.py:66-72`` — per bs=1 *process*, not per
        epoch)."""
        try:
            st = os.stat(dcfg.mesh)
            file_id = (st.st_mtime_ns, st.st_size)
        except OSError:
            file_id = None
        key = (dcfg.mesh, file_id, dcfg.fx, dcfg.fy, dcfg.u0, dcfg.v0,
               dcfg.width, dcfg.height, use_cfg_diam,
               dcfg.diam if use_cfg_diam else None)
        hit = _CTX_CACHE.get(key)
        if hit is not None:
            return hit
        ctx = cls._build_from_data_config(dcfg, use_cfg_diam=use_cfg_diam)
        _CTX_CACHE[key] = ctx
        while len(_CTX_CACHE) > 32:          # bound: 13 objects × few dims
            _CTX_CACHE.pop(next(iter(_CTX_CACHE)))
        return ctx

    @classmethod
    def _build_from_data_config(cls, dcfg: DataConfig, *,
                                use_cfg_diam: bool = False) -> "EvalContext":
        mesh = MeshPly(dcfg.mesh)
        verts = np.asarray(mesh.vertices, np.float32)
        vertices = np.concatenate(
            [verts, np.ones((len(verts), 1), np.float32)], axis=1).T
        corners3D = get_3D_corners(vertices)
        pts3d = np.concatenate(
            [np.zeros((3, 1), np.float32), corners3D[:3, :]], axis=1).T
        diam = dcfg.diam if (use_cfg_diam and dcfg.diam) else \
            calc_pts_diameter(verts)
        K = get_camera_intrinsic(dcfg.u0, dcfg.v0, dcfg.fx, dcfg.fy)
        return cls(pts3d.astype(np.float32), vertices.astype(np.float32),
                   K.astype(np.float32), float(diam),
                   dcfg.width, dcfg.height)


class PoseErrors:
    """Accumulates per-frame error families across eval batches."""

    def __init__(self):
        self.errs_2d: List[float] = []
        self.errs_3d: List[float] = []
        self.errs_trans: List[float] = []
        self.errs_angle: List[float] = []
        self.errs_corner2d: List[float] = []

    def extend(self, other: Dict[str, np.ndarray]):
        self.errs_2d.extend(np.atleast_1d(other["err_2d"]).tolist())
        self.errs_3d.extend(np.atleast_1d(other["err_3d"]).tolist())
        self.errs_trans.extend(np.atleast_1d(other["err_trans"]).tolist())
        self.errs_angle.extend(np.atleast_1d(other["err_angle"]).tolist())
        self.errs_corner2d.extend(
            np.atleast_1d(other["err_corner2d"]).tolist())

    def __len__(self):
        return len(self.errs_2d)


def truths_length(truths: np.ndarray, max_num_gt: int = 50) -> int:
    """Number of GT slots before the first empty one (x0 == 0)."""
    t = truths.reshape(max_num_gt, -1)
    empty = np.nonzero(t[:, 1] == 0)[0]
    return int(empty[0]) if empty.size else max_num_gt


def gt_corner_boxes(target_row: np.ndarray, num_keypoints: int = 9,
                    max_num_gt: int = 50) -> np.ndarray:
    """Extract (nGT, 2K) normalized GT keypoints from a padded label row."""
    K = num_keypoints
    t = target_row.reshape(max_num_gt, -1)
    n = truths_length(target_row, max_num_gt)
    return t[:n, 1:2 * K + 1]


def pose_metrics(corners2d_gt: np.ndarray, corners2d_pr: np.ndarray,
                 ctx: EvalContext, *, pnp_iters: int = 15,
                 fix_gt_corners: bool = False,
                 symmetric: bool = False) -> Dict[str, np.ndarray]:
    """Batched metric computation for (B,9,2) pixel-space keypoints.

    Runs gt and pred PnP in one 2B-sized batched solve, then the five error
    families of ``valid.py:137-177``.  ``fix_gt_corners`` applies the
    OCCLUSION GT corner permutation (``valid_multi.py:132``).

    ``symmetric=True`` computes the 3D error as ADD-S (mean nearest-neighbour
    vertex distance, Hinterstoisser's symmetric-object protocol) instead of
    the index-matched ADD.  The reference *defines* ``adi`` (``utils.py:
    60-64``) but never calls it — its eval scores the symmetric LINEMOD
    objects (eggbox, glue) with plain ADD.  Default matches the reference;
    opt in via ``run_validation(add_s=True)`` / ``ssp valid --add_s`` when
    comparing against papers that report ADD-S for those objects.
    """
    B = corners2d_gt.shape[0]
    gt = np.asarray(corners2d_gt, np.float32)
    pr = np.asarray(corners2d_pr, np.float32)
    if fix_gt_corners:
        gt = np.stack([fix_corner_order(g) for g in gt])

    err_corner = np.linalg.norm(gt - pr, axis=2).mean(axis=1)

    stacked = np.concatenate([gt, pr], axis=0)          # (2B,9,2)
    R, t = pnp_batched(ctx.points_3d, stacked, ctx.intrinsics,
                       iters=pnp_iters)
    R = np.asarray(R)
    t = np.asarray(t)
    R_gt, R_pr = R[:B], R[B:]
    t_gt, t_pr = t[:B], t[B:]

    err_trans = np.linalg.norm(t_gt - t_pr, axis=1)
    # batched geodesic angle: tr(Rg Rp^T) = Σ Rg⊙Rp (calc_angular_distance
    # vectorized — the per-frame python loop costs at 10k+ eval frames)
    trace = np.einsum("bij,bij->b", R_gt, R_pr)
    err_angle = np.degrees(np.arccos(np.clip((trace - 1.0) / 2.0, -1.0, 1.0)))

    # vectorized projection of all mesh vertices under both poses
    Rt_gt = np.concatenate([R_gt, t_gt[:, :, None]], axis=2)   # (B,3,4)
    Rt_pr = np.concatenate([R_pr, t_pr[:, :, None]], axis=2)
    V = ctx.vertices                                            # (4,N)

    def proj(Rt):
        cam = np.einsum("bij,jn->bin", Rt, V)                   # (B,3,N)
        pix = np.einsum("ij,bjn->bin", ctx.intrinsics, cam)
        return pix[:, :2] / pix[:, 2:3]

    p_gt, p_pr = proj(Rt_gt), proj(Rt_pr)
    err_2d = np.linalg.norm(p_gt - p_pr, axis=1).mean(axis=1)

    cam_gt = np.einsum("bij,jn->bin", Rt_gt, V)
    cam_pr = np.einsum("bij,jn->bin", Rt_pr, V)
    if symmetric:
        from .utils.geometry import adi
        # ADD-S: per-frame nearest-neighbour distance (gt points queried
        # against a KD-tree of predicted points, matching reference adi's
        # argument order).  Host loop — opt-in, eval-only.
        err_3d = np.array([adi(cam_pr[b].T, cam_gt[b].T)
                           for b in range(B)], np.float32)
    else:
        err_3d = np.linalg.norm(cam_gt - cam_pr, axis=1).mean(axis=1)

    return {"err_2d": err_2d, "err_3d": err_3d, "err_trans": err_trans,
            "err_angle": err_angle, "err_corner2d": err_corner,
            "R_gt": R_gt, "R_pr": R_pr, "t_gt": t_gt, "t_pr": t_pr}


def accuracy_summary(errors: PoseErrors, diam: float,
                     px_threshold: float = PX_THRESHOLD) -> Dict[str, float]:
    """The reference's headline numbers (``valid.py:201-209``)."""
    e2d = np.asarray(errors.errs_2d)
    e3d = np.asarray(errors.errs_3d)
    et = np.asarray(errors.errs_trans)
    ea = np.asarray(errors.errs_angle)
    ec = np.asarray(errors.errs_corner2d)
    n = len(e2d)
    return {
        "acc_2d_proj": float((e2d <= px_threshold).sum() * 100.0 / (n + EPS)),
        "acc_add_0.1d": float((e3d <= diam * 0.1).sum() * 100.0 / (n + EPS)),
        "acc_5cm5deg": float(((et <= 0.05) & (ea <= 5)).sum() * 100.0
                             / (n + EPS)),
        "acc_corner_2d": float((ec <= px_threshold).sum() * 100.0 / (n + EPS)),
        "mean_err_2d": float(e2d.mean()) if n else float("nan"),
        "mean_err_3d": float(e3d.mean()) if n else float("nan"),
        "mean_corner_err_2d": float(ec.mean()) if n else float("nan"),
        "mean_err_trans": float(et.mean()) if n else float("nan"),
        "mean_err_angle": float(ea.mean()) if n else float("nan"),
        "n_samples": n,
    }


def box3d_iou(Rt_gt: np.ndarray, Rt_pr: np.ndarray,
              corners3d: np.ndarray, grid: int = 24) -> float:
    """IoU of the posed 3D bounding boxes (deterministic grid approximation).

    The BASELINE config sweep names "3D IoU" alongside 2D-projection and ADD;
    the reference repo itself never computes it, so this is a beyond-parity
    metric.  Exact oriented-box intersection is a convex-polytope problem;
    here a ``grid³`` lattice over the gt box is transformed into the pred
    box's frame and counted — deterministic, accurate to ~1/grid, and
    symmetric enough for thresholded accuracy use.

    Args:
      Rt_gt / Rt_pr: (3,4) object→camera transforms.
      corners3d: (8,3) model-frame box corners (axis-aligned around origin).
    """
    lo = corners3d.min(axis=0)
    hi = corners3d.max(axis=0)
    ax = [np.linspace(l, h, grid, dtype=np.float32) for l, h in zip(lo, hi)]
    gx, gy, gz = np.meshgrid(*ax, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)    # gt-frame lattice

    # gt-frame point → camera → pred object frame
    cam = pts @ Rt_gt[:, :3].T + Rt_gt[:, 3]
    obj_pr = (cam - Rt_pr[:, 3]) @ Rt_pr[:, :3]             # R^T (x - t)
    eps = 1e-5 * (hi - lo)   # absorb f32 cancellation at the box boundary
    inside = np.all((obj_pr >= lo - eps) & (obj_pr <= hi + eps), axis=1)
    inter = inside.mean() * np.prod(hi - lo)
    union = 2.0 * np.prod(hi - lo) - inter
    return float(inter / union) if union > 0 else 0.0


def multi_accuracy_table(errs_2d: Sequence[float],
                         thresholds: Sequence[float] = tuple(range(5, 55, 5))
                         ) -> Dict[int, float]:
    """2D-reproj accuracy at 5..50 px (``valid_multi.py:153-158``)."""
    e = np.asarray(errs_2d)
    n = len(e)
    return {int(th): float((e <= th).sum() * 100.0 / (n + EPS))
            for th in thresholds}
