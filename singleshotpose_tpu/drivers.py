"""High-level drivers: training and validation runs (reference CLI parity).

Rebuild of ``train.py:273-410`` and ``valid.py:15-233`` orchestration on the
TPU-native stack: fused jitted train step, bucketed multi-scale loader,
on-device decode, batched PnP eval.  The reference's behaviors are kept —
step-LR schedule in batch units, pretrain confidence gating, eval every 10
epochs after epoch 15, best-checkpoint-by-2D-accuracy in darknet ``.weights``
format, ``costs.npz`` training curves, resume from the ``seen`` header — with
the host↔device churn removed.
"""

from __future__ import annotations

import dataclasses
import os
import time
import weakref
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from . import weights as W
from .config import DataConfig, data_config_from_options, parse_cfg, read_data_cfg
from .data.pipeline import (MULTI_SCHEDULE, SINGLE_SCHEDULE, AugmentConfig,
                            Loader, PoseDataset)
from .data.prefetch import prefetch
from .evaluate import (EvalContext, PoseErrors, accuracy_summary,
                       multi_accuracy_table, pose_metrics)
from .models.darknet import DarknetSpec, fold_batchnorm
from .ops.decode import (best_box_for_class, best_boxes,
                         best_boxes_per_class, decode_grid)
from .ops.losses import RegionLossConfig
from .training import (TrainState, init_train_state, make_train_step,
                       schedule_lr)
from .utils.labels import get_all_files

__all__ = ["load_spec", "loss_config_from_spec", "run_validation",
           "run_validation_multi", "run_validation_multi_sweep",
           "run_training", "run_training_multi", "TrainRunConfig"]


def _log(msg: str) -> None:
    print(f"{time.strftime('%Y-%m-%d %H:%M:%S')} {msg}", flush=True)


def _mesh_cache_key(mesh):
    """Stable mesh identity for eval-bank LRU keys.  ``id(mesh)`` is unsafe
    (CPython recycles ids after GC, so a new mesh could alias a stale bank
    sharded for dead devices) and over-strict (equivalent-but-distinct Mesh
    objects would each rebuild a ~GB bank)."""
    if mesh is None:
        return None
    return (mesh.axis_names, tuple(sorted(mesh.shape.items())),
            tuple(d.id for d in mesh.devices.flat))


def load_spec(modelcfg: Union[str, DarknetSpec]) -> DarknetSpec:
    """Accept a `.cfg` path or an already-built DarknetSpec."""
    if isinstance(modelcfg, DarknetSpec):
        return modelcfg
    return DarknetSpec(parse_cfg(modelcfg))


def loss_config_from_spec(spec: DarknetSpec, *, pretrain_num_epochs: int,
                          im_width: int, im_height: int,
                          multi: bool = False,
                          honor_cfg_scales: bool = False,
                          use_pallas: Optional[bool] = None,
                          mesh=None) -> RegionLossConfig:
    """Loss config: topology from the spec's [region] block, scales per the
    reference's EFFECTIVE behavior.

    The reference loss modules hard-code coord/object/noobject/class scales
    1/5/1/1 and thresh 0.6 and IGNORE the [region] values
    (``region_loss.py:88-91``, ``region_loss_multi.py:103-106``) — every
    published run, including yolo-pose-pre's nominally-zeroed scales, trained
    with 1/5/1/1.  Default = that parity behavior; ``honor_cfg_scales=True``
    opts into what the cfg files *say*.
    """
    r = spec.region
    scales = dict(coord_scale=r.coord_scale, noobject_scale=r.noobject_scale,
                  object_scale=r.object_scale, class_scale=r.class_scale,
                  sil_thresh=r.thresh) if honor_cfg_scales else \
        dict(coord_scale=1.0, noobject_scale=1.0, object_scale=5.0,
             class_scale=1.0, sil_thresh=0.6)
    return RegionLossConfig(
        num_keypoints=spec.num_keypoints,
        num_classes=r.classes, num_anchors=r.num, anchors=r.anchors,
        pretrain_num_epochs=pretrain_num_epochs,
        with_class_loss=multi and r.classes > 1,
        im_width=float(im_width), im_height=float(im_height),
        use_pallas=use_pallas, mesh=mesh, **scales)


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


# jitted eval forwards, cached per (spec identity, compute dtype) so repeated
# in-training evals and multi-object sweeps reuse one compiled executable
# instead of retracing a fresh closure every call
_FWD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _eval_forward(spec: DarknetSpec, compute_dtype, transfer: str = "rgb",
                  out_shape: Optional[Tuple[int, int]] = None,
                  pick: Optional[Tuple] = None):
    """Jitted eval forward for a transfer mode, optionally with the box pick
    fused into the same executable.

    ``transfer="rgb"``: takes (params, images) — u8 or f32 NHWC at eval size
    (u8 normalizes on device).  ``transfer="yuv420"``: takes
    (params, y, cbcr) native-size planes; the device converts + resizes to
    ``out_shape`` (w, h) before the net (ops/yuv.py) — the transfer-optimal
    path for bandwidth-limited host↔device links.

    ``pick``: None returns the decoded grid; ``("best",)``,
    ``("per_class", conf_thresh)``, or ``("for_class", cls, conf_thresh)``
    fuse the corresponding box selection (one dispatch per batch, and the
    decoded grid never materializes between executables).
    """
    key = (str(compute_dtype), transfer, out_shape, pick)
    per_spec = _FWD_CACHE.setdefault(spec, {})
    if key not in per_spec:
        K, C, nA = spec.num_keypoints, spec.num_classes, spec.num_anchors
        # weak ref: a closure holding `spec` strongly would pin the WeakKey
        # entry (value → key cycle) and no spec could ever be evicted
        spec_ref = weakref.proxy(spec)

        def net_and_decode(p, images):
            if jnp.issubdtype(images.dtype, jnp.integer):
                # u8 transfer path: normalize on device (4x lighter h2d)
                images = images.astype(jnp.float32) / 255.0
            if any("wq" in v for v in p.values()):
                # int8-quantized serving params (models/quantize.py)
                from .models.quantize import apply_quantized
                head = apply_quantized(spec_ref, p, images,
                                       compute_dtype=compute_dtype)
            else:
                head = spec_ref.apply_folded(p, images,
                                             compute_dtype=compute_dtype)
            decoded = decode_grid(head.astype(jnp.float32), K, C, nA)
            if pick is None:
                return decoded
            if pick[0] == "best":
                return best_boxes(decoded)
            if pick[0] == "per_class":
                return best_boxes_per_class(decoded, pick[1])
            if pick[0] == "for_class":
                return best_box_for_class(decoded, pick[1], pick[2])
            raise ValueError(f"unknown pick {pick!r}")

        if transfer == "yuv420":
            from .ops.yuv import yuv420_to_rgb_resized
            out_w, out_h = out_shape

            @jax.jit
            def forward(p, y, cbcr):
                return net_and_decode(
                    p, yuv420_to_rgb_resized(y, cbcr, out_w=out_w,
                                             out_h=out_h))
        else:
            forward = jax.jit(net_and_decode)

        per_spec[key] = forward
    return per_spec[key]


def _eval_pass(spec: DarknetSpec, params, batch_stats, loader: Loader,
               ctx: EvalContext, *, pick: Tuple, num_keypoints: int,
               fix_gt_corners: bool = False,
               compute_dtype=jnp.bfloat16,
               transfer: str = "rgb",
               out_shape: Optional[Tuple[int, int]] = None,
               quantize: Union[bool, str] = False,
               mesh=None, add_s: bool = False):
    """Shared eval loop: (forward → decode → pick box) in ONE executable per
    batch → batched metrics at the end.

    ``pick`` selects the fused box pick (see :func:`_eval_forward`): "best"
    yields per-image boxes (B, 2K+3); "per_class" yields (B, C, 2K+3) and
    each ground truth is paired with the box of its own class (reference:
    ``valid_multi.py:118-123``).
    Returns (PoseErrors, artifacts dict with corners/metrics/image_idx,
    empty dict if no GT).

    ``mesh``: a ("data","model") Mesh for multi-chip eval — batches shard
    over the ``data`` axis, params follow the TP output-channel rule
    (``parallel/sharding.py``; GSPMD inserts the collectives).  Ragged tail
    batches are zero-padded up to a multiple of the data-axis size; padded
    rows have no labels so they never reach the metrics.
    """
    # int8 serving path (models/quantize.py): the whole eval runs the MXU's
    # 2x int8 peak.  quantize="<path>.npz" loads a pre-quantized artifact
    # written by `ssp quantize` / save_quantized (no f32 weights needed);
    # quantize=True calibrates activation scales on the first batch.
    stream = loader
    if isinstance(quantize, str):
        from .models.quantize import load_quantized
        # npz leaves are host numpy: place on device ONCE, or every forward
        # re-uploads the whole weight pytree per batch
        folded = jax.device_put(load_quantized(quantize))
    else:
        folded = fold_batchnorm(spec, params, batch_stats)
        if quantize:
            if transfer != "rgb":
                raise ValueError(
                    "quantize=True requires transfer='rgb' (calibration "
                    "runs on eval-size RGB batches); pre-quantized "
                    "quantize='<path>.npz' composes with any transfer")
            from .models.quantize import (calibrate_activations,
                                          quantize_folded)
            # single iterator: the calibration batch is chained back in
            # front so batch 0 is decoded once, not twice
            import itertools
            it = iter(loader)
            first = next(it, None)
            if first is None:
                raise ValueError("quantize=True needs a non-empty loader "
                                 "for calibration")
            calib = jnp.asarray(first[0])
            if jnp.issubdtype(calib.dtype, jnp.integer):
                calib = calib.astype(jnp.float32) / 255.0
            # per_channel: activation-range equalization (scales folded into
            # the weights — zero serving cost). Measured on 3 training
            # seeds × 256 held-out frames: worst-seed acc@5px delta vs bf16
            # improves from −7.0pp (scalar absmax) to −1.6pp (models/
            # quantize.calibrate_activations docstring has the protocol).
            amax = calibrate_activations(spec, folded, calib,
                                         compute_dtype=compute_dtype,
                                         per_channel=True)
            folded = quantize_folded(spec, folded, amax)
            stream = itertools.chain([first], it)
    K = num_keypoints
    forward = _eval_forward(spec, compute_dtype, transfer, out_shape, pick)

    dp = 1
    multihost = mesh is not None and jax.process_count() > 1
    if mesh is not None:
        from .parallel.sharding import (batch_sharding,
                                        folded_param_shardings, replicated)
        dp = int(mesh.shape["data"])
        if quantize:
            # int8 pytree ({"wq","sw","sa","b"}): replicate; the batch axis
            # still shards, which is where multi-chip eval wins anyway
            shardings = jax.tree.map(lambda _: replicated(mesh), folded)
        else:
            shardings = folded_param_shardings(spec, mesh)
        if multihost:
            # multi-controller: device_put cannot reshard onto devices this
            # process doesn't own; a jitted identity with out_shardings is
            # the SPMD reshard every process executes in lockstep (works for
            # global training-state params AND replicated host pytrees)
            folded = jax.jit(lambda t: t, out_shardings=shardings)(folded)
        else:
            folded = jax.tree.map(jax.device_put, folded, shardings)

        def _shard(a):
            if isinstance(a, jax.Array):
                # already device-resident (EvalBank slices carry their mesh
                # sharding from the bank's (None, "data") placement)
                return a
            a = np.asarray(a)
            if a.shape[0] % dp:                 # zero-pad the ragged tail
                pad = (-a.shape[0]) % dp
                a = np.concatenate(
                    [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
            sh = batch_sharding(mesh, a.ndim)
            if multihost:
                # every process decoded the same full batch (the eval split
                # is not dataset-sharded); each materializes its own shards
                return jax.make_array_from_callback(a.shape, sh,
                                                    lambda idx: a[idx])
            return jax.device_put(a, sh)
    else:
        _shard = jnp.asarray

    # async pipeline: the prefetch thread decodes batch i+1 while the device
    # runs batch i (JAX dispatch is non-blocking), and the per-batch box
    # picks stay ON DEVICE — one device_get at the end syncs everything.
    # Through a high-latency host↔device link (the dev-env tunnel round-trip
    # is ~25 ms) per-batch syncs alone would cap eval below 50 fps.
    pending: List[Tuple[jax.Array, np.ndarray]] = []
    for images, labels in prefetch(stream):
        if isinstance(images, tuple):       # yuv420: (y, cbcr) planes
            boxes = forward(folded, _shard(images[0]), _shard(images[1]))
        else:
            boxes = forward(folded, _shard(images))
        pending.append((boxes, labels))
    boxes_list = [b for b, _ in pending]
    if multihost:
        # boxes are sharded over the data axis, which spans processes —
        # replicate (one SPMD program over the whole list) so every host
        # can pull the full set and run the identical metric suite
        from jax.sharding import NamedSharding, PartitionSpec
        reps = jax.tree.map(
            lambda _: NamedSharding(mesh, PartitionSpec()), boxes_list)
        boxes_list = jax.jit(lambda t: t, out_shardings=reps)(boxes_list)
    all_boxes = jax.device_get(boxes_list)

    # vectorized GT gather (same order as the reference's nested image/GT
    # loops, valid.py:117-130): "break at first empty slot" via cumprod
    all_gt: List[np.ndarray] = []
    all_pr: List[np.ndarray] = []
    image_idx: List[np.ndarray] = []
    img_base = 0
    for boxes, (_, labels) in zip(all_boxes, pending):
        B = labels.shape[0]
        lab = labels.reshape(B, 50, -1)
        valid = np.cumprod(lab[:, :, 1] != 0, axis=1).astype(bool)  # (B,50)
        bidx, gidx = np.nonzero(valid)                  # row-major = loop order
        if bidx.size:
            all_gt.append(lab[bidx, gidx, 1:2 * K + 1])
            classes = lab[bidx, gidx, 0].astype(int)
            pr = boxes[bidx, classes] if boxes.ndim == 3 else boxes[bidx]
            all_pr.append(pr[:, :2 * K])
            image_idx.append(img_base + bidx)
        img_base += B

    errors = PoseErrors()
    if not all_gt:
        return errors, {}
    scale = np.tile(np.array([ctx.im_width, ctx.im_height], np.float32), K)
    gt = (np.concatenate(all_gt) * scale).reshape(-1, K, 2)
    pr = (np.concatenate(all_pr) * scale).reshape(-1, K, 2)
    metrics = pose_metrics(gt, pr, ctx, fix_gt_corners=fix_gt_corners,
                           symmetric=add_s)
    errors.extend(metrics)
    return errors, {"corners_gt": gt, "corners_pr": pr, "metrics": metrics,
                    "image_idx": np.concatenate(image_idx)}


def run_validation(datacfg: str, modelcfg: Union[str, DarknetSpec],
                   weightfile: Optional[str] = None, *,
                   params=None, batch_stats=None,
                   batch_size: int = 16, num_workers: int = 8,
                   compute_dtype=jnp.bfloat16,
                   save: bool = False,
                   transfer: str = "rgb",
                   quantize: Union[bool, str] = False,
                   mesh=None, add_s: bool = False,
                   verbose: bool = True) -> Dict[str, float]:
    """Single-object eval (reference ``valid.py``): full 6D metric suite.

    ``add_s=True`` scores the 3D-transform metric as ADD-S (nearest-neighbour
    vertex distance) for symmetric objects (LINEMOD eggbox/glue).  Default
    False = index-matched ADD, the reference's behavior for ALL objects
    (its ``adi``, ``utils.py:60-64``, is defined but never called).

    Either ``weightfile`` (darknet binary) or (``params``, ``batch_stats``)
    must be given.  ``save=True`` dumps per-frame R/t/corner files under
    ``<backup>/test/{gt,pr}/`` and a consolidated predictions ``.mat``
    (reference: ``valid.py:186-197,231-233``).  ``transfer="yuv420"`` ships
    native-size YUV 4:2:0 planes and converts + resizes on device — ≥2.9×
    fewer host→device bytes (needs the native loader; input pixels differ
    from the RGB path only by the JPEG chroma round-trip — luma is ~exact,
    ≲2 u8 levels total on photographic content; tests/test_yuv.py bounds
    both and checks trained-net metric equivalence).
    ``transfer="bank"`` decodes the split ONCE into an HBM-resident eval
    bank (``data/eval_bank.py``, LRU-cached across calls): repeated evals —
    the in-training cadence, reference ``train.py:395`` — then run with zero
    host decode and zero per-frame transfer, so throughput is
    link-insensitive; pixels are bit-identical to the rgb path.
    ``quantize=True`` serves the backbone convs in int8 (per-channel weights,
    first-batch-calibrated activation scales — models/quantize.py), the
    MXU's 2× throughput mode.  ``mesh``: a ("data","model") Mesh for
    multi-chip eval (batch shards over ``data``; ragged tails zero-padded).
    """
    dcfg = data_config_from_options(read_data_cfg(datacfg))
    spec = load_spec(modelcfg)
    if weightfile is not None:
        _, params, batch_stats = W.load_weights(spec, weightfile)
    assert isinstance(quantize, str) or (
        params is not None and batch_stats is not None), \
        "need weightfile or (params, batch_stats) — or a "\
        "pre-quantized .npz via quantize="

    ctx = EvalContext.from_data_config(dcfg)
    ds = PoseDataset(dcfg.valid, train=False,
                     num_keypoints=spec.num_keypoints)
    out_shape = (spec.net.test_width, spec.net.test_height)
    if transfer == "bank":
        from .data.eval_bank import get_eval_bank
        loader = get_eval_bank(
            ds, out_shape, batch_size, num_workers=num_workers, mesh=mesh,
            cache_key=("single", dcfg.valid, out_shape, batch_size,
                       spec.num_keypoints, _mesh_cache_key(mesh)))
        fwd_transfer = "rgb"        # bank slices ARE eval-size u8 rgb
    else:
        loader = Loader(ds, batch_size, shuffle=False, schedule=None,
                        fixed_shape=out_shape,
                        num_workers=num_workers, drop_last=False,
                        out_uint8=True, out_yuv420=transfer == "yuv420")
        fwd_transfer = transfer

    if verbose:
        _log(f"   Testing {dcfg.name}...")
        _log(f"   Number of test samples: {len(ds)}")
    errors, artifacts = _eval_pass(
        spec, params, batch_stats, loader, ctx, pick=("best",),
        num_keypoints=spec.num_keypoints, compute_dtype=compute_dtype,
        transfer=fwd_transfer, out_shape=out_shape, quantize=quantize,
        mesh=mesh, add_s=add_s)
    summary = accuracy_summary(errors, ctx.diam)
    if save and artifacts:
        _save_predictions(dcfg, ds, artifacts)
    if verbose:
        _log(f"Results of {dcfg.name}")
        _log("   Acc using 5 px 2D Projection = "
             f"{summary['acc_2d_proj']:.2f}%")
        _log(f"   Acc using 10% threshold - {ctx.diam * 0.1} vx 3D "
             f"Transformation = {summary['acc_add_0.1d']:.2f}%")
        _log("   Acc using 5 cm 5 degree metric = "
             f"{summary['acc_5cm5deg']:.2f}%")
        _log(f"   Mean 2D pixel error is {summary['mean_err_2d']:f}, "
             f"Mean vertex error is {summary['mean_err_3d']:f}, "
             f"mean corner error is {summary['mean_corner_err_2d']:f}")
        _log(f"   Translation error: {summary['mean_err_trans']:f} m, "
             f"angle error: {summary['mean_err_angle']:f} degree")
    return summary


def _save_predictions(dcfg: DataConfig, ds: PoseDataset, artifacts) -> None:
    """Per-frame R/t/corner dumps + consolidated ``.mat``
    (reference: ``valid.py:186-197,231-233``)."""
    backup = dcfg.backup or "backup"
    m = artifacts["metrics"]
    gt_dir = os.path.join(backup, "test", "gt")
    pr_dir = os.path.join(backup, "test", "pr")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(pr_dir, exist_ok=True)
    n = artifacts["corners_gt"].shape[0]
    image_idx = artifacts.get("image_idx")
    for i in range(n):
        # artifact rows are per-GT; map each back to its source image so
        # zero-GT or multi-GT frames don't shift the filenames
        src = int(image_idx[i]) if image_idx is not None else i
        stem = os.path.splitext(os.path.basename(
            ds.lines[src] if src < len(ds.lines) else f"{src:06d}"))[0]
        if image_idx is not None and (image_idx == image_idx[i]).sum() > 1:
            k = int((image_idx[:i] == image_idx[i]).sum())
            stem = f"{stem}_obj{k}"
        np.savetxt(os.path.join(gt_dir, f"R_{stem}.txt"), m["R_gt"][i])
        np.savetxt(os.path.join(gt_dir, f"t_{stem}.txt"), m["t_gt"][i])
        np.savetxt(os.path.join(gt_dir, f"corners_{stem}.txt"),
                   artifacts["corners_gt"][i])
        np.savetxt(os.path.join(pr_dir, f"R_{stem}.txt"), m["R_pr"][i])
        np.savetxt(os.path.join(pr_dir, f"t_{stem}.txt"), m["t_pr"][i])
        np.savetxt(os.path.join(pr_dir, f"corners_{stem}.txt"),
                   artifacts["corners_pr"][i])
    try:
        import scipy.io
        scipy.io.savemat(
            os.path.join(backup, f"predictions_linemod_{dcfg.name}.mat"),
            {"R_gts": m["R_gt"], "t_gts": m["t_gt"],
             "corner_gts": artifacts["corners_gt"],
             "R_prs": m["R_pr"], "t_prs": m["t_pr"],
             "corner_prs": artifacts["corners_pr"]})
    except ImportError:
        _log("scipy unavailable: skipped predictions .mat dump")


# occlusion eval sweep objects (reference valid_multi.py:160-177)
OCCLUSION_EVAL_OBJECTS = ("ape", "can", "cat", "duck", "glue", "holepuncher")


def run_validation_multi(datacfg: Union[str, DataConfig],
                         modelcfg: Union[str, DarknetSpec],
                         weightfile: Optional[str] = None, *,
                         params=None, batch_stats=None,
                         objclass: Optional[str] = None,
                         class_id: Optional[int] = None,
                         conf_thresh: Optional[float] = None,
                         batch_size: int = 16, num_workers: int = 8,
                         compute_dtype=jnp.bfloat16,
                         transfer: str = "rgb",
                         quantize: Union[bool, str] = False,
                         mesh=None,
                         verbose: bool = True) -> Dict[str, object]:
    """Multi-object OCCLUSION eval for one object (reference
    ``valid_multi.py:20-158``): class-picked boxes, ``fix_corner_order`` on
    GT, pixel-error accuracy table at 5..50 px."""
    if isinstance(datacfg, DataConfig):
        options: Dict[str, str] = {}
        dcfg = datacfg
    else:
        options = read_data_cfg(datacfg)
        dcfg = data_config_from_options(options)
    spec = load_spec(modelcfg)
    if weightfile is not None:
        _, params, batch_stats = W.load_weights(spec, weightfile)
    assert isinstance(quantize, str) or (
        params is not None and batch_stats is not None), \
        "need weightfile or (params, batch_stats) — or a "\
        "pre-quantized .npz via quantize="
    if conf_thresh is None:
        conf_thresh = spec.net.conf_thresh
    name = objclass or dcfg.name
    if class_id is None and "class_id" in options:
        class_id = int(options["class_id"])

    ctx = EvalContext.from_data_config(dcfg)

    def occlusion_label_path(imgpath: str) -> str:
        # reference: dataset_multi.py:78 — swap object name + labels_occlusion
        return (imgpath.replace("benchvise", name)
                .replace("images", "labels_occlusion")
                .replace("JPEGImages", "labels_occlusion")
                .replace(".jpg", ".txt").replace(".png", ".txt"))

    ds = PoseDataset(dcfg.valid, train=False,
                     num_keypoints=spec.num_keypoints,
                     label_path_fn=occlusion_label_path)
    # multi eval runs at the TRAIN resolution (reference valid_multi.py:71
    # uses shape=(model.width, model.height), not test_width)
    out_shape = (spec.net.width, spec.net.height)
    if transfer == "bank":
        from .data.eval_bank import get_eval_bank
        # key includes the object name: the sweep reuses OCCLUSION frames
        # under per-object label files (occlusion_label_path above)
        loader = get_eval_bank(
            ds, out_shape, batch_size, num_workers=num_workers, mesh=mesh,
            cache_key=("multi", dcfg.valid, name, out_shape, batch_size,
                       spec.num_keypoints, _mesh_cache_key(mesh)))
        fwd_transfer = "rgb"
    else:
        loader = Loader(ds, batch_size, shuffle=False, schedule=None,
                        fixed_shape=out_shape,
                        num_workers=num_workers, drop_last=False,
                        out_uint8=True, out_yuv420=transfer == "yuv420")
        fwd_transfer = transfer

    # class_id set → the best box of THAT class per image; otherwise
    # per-class boxes and each GT pairs with the box of its OWN class
    # (reference valid_multi.py:118-123 semantics; fixes the multi-GT case
    # where the first GT's class was used for all)
    pick = ("for_class", class_id, conf_thresh) if class_id is not None \
        else ("per_class", conf_thresh)

    if verbose:
        _log(f"   Testing {name}...")
    errors, _artifacts = _eval_pass(
        spec, params, batch_stats, loader, ctx, pick=pick,
        num_keypoints=spec.num_keypoints, fix_gt_corners=True,
        compute_dtype=compute_dtype, transfer=fwd_transfer,
        out_shape=out_shape, quantize=quantize, mesh=mesh)
    table = multi_accuracy_table(errors.errs_2d)
    if verbose:
        for th, acc in table.items():
            _log(f"   Acc using {th} px 2D Projection = {acc:.2f}%")
    return {"name": name, "acc_table": table,
            "mean_err_2d": float(np.mean(errors.errs_2d))
            if len(errors) else float("nan"),
            "n_samples": len(errors)}


def run_validation_multi_sweep(occlusion_datacfg: str,
                               modelcfg: Union[str, DarknetSpec],
                               weightfile: str,
                               **kw) -> List[Dict[str, object]]:
    """Eval every object listed in a multi ``.data``'s numbered
    ``valid<i>``/``mesh<i>``/``diam<i>`` keys (``occlusion.data``)."""
    from .config import occlusion_sweep
    dcfg = data_config_from_options(read_data_cfg(occlusion_datacfg))
    spec = load_spec(modelcfg)
    _, params, batch_stats = W.load_weights(spec, weightfile)
    return [run_validation_multi(entry, spec, params=params,
                                 batch_stats=batch_stats, **kw)
            for entry in occlusion_sweep(dcfg)]


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainRunConfig:
    """Knobs beyond the reference CLI (sane defaults = reference behavior)."""
    eval_every: int = 10           # train.py:395 (epoch % 10)
    eval_after: int = 15           # train.py:395 (epoch > 15)
    save_best_metric: str = "acc_2d_proj"
    compute_dtype: object = jnp.bfloat16
    num_workers: int = 8
    eval_batch_size: int = 16
    bg_dir: str = "VOCdevkit/VOC2012/JPEGImages"
    seed: int = 0
    max_epochs_override: Optional[int] = None
    log_every: int = 20            # batches
    # beyond-reference capability:
    mesh: Optional[object] = None  # jax.sharding.Mesh → sharded DP training
    orbax_dir: Optional[str] = None    # enable Orbax full-state checkpoints
    orbax_every_epochs: int = 10
    resume: bool = False               # restore latest Orbax state
    profile_dir: Optional[str] = None  # jax.profiler trace of a few steps
    profile_steps: Tuple[int, int] = (5, 10)
    cache_decoded: bool = False        # RAM-cache decoded images across epochs
    # in-training eval transfer mode: "auto" | "rgb" | "yuv420" | "bank".
    # "bank" decodes the test split once into HBM (data/eval_bank.py) — every
    # eval epoch after the first runs with zero host decode / per-frame
    # transfer (614.9 vs 53.4 fps through a 53 MB/s link, BENCH_r03).
    # "auto" (default) picks "bank" when the split fits the device's HBM
    # budget with headroom (preflight in _resolve_eval_transfer), else "rgb".
    eval_transfer: str = "auto"
    loader_backend: str = "auto"  # auto|python|native|device|device_bank
    #                               (multi: auto|python|device_synth)
    precompile_buckets: bool = False   # pre-pay multi-scale XLA compiles
    # None → auto: fused Pallas stem (ops/stem.py) on a TPU backend with
    # bf16 compute (batch-8 train step 14.9 → 10.9 ms on v5e).  Under a
    # mesh it runs as a shard_map over the data axis with psum'd BN stats
    # (per-device batch gate in stem_supported).
    fused_stem: Optional[bool] = None
    # device_synth placement knobs (multi trainer, loader_backend=
    # "device_synth"): parallel proposals per companion (None → the host
    # synthesizer's max_attempts, exact drop-law parity; lower = faster,
    # fewer objects in crowded scenes) and the mask-overlap test resolution
    # divisor (4 = measured distribution-neutral at ~2x throughput)
    synth_attempts: Optional[int] = None
    synth_propose_scale: int = 4



_EVAL_BANK_HEADROOM = 1 << 30   # keep >= 1 GB free for eval activations


def _count_list_lines(path: str) -> int:
    try:
        with open(path) as f:
            return sum(1 for line in f if line.strip())
    except OSError:
        return 0


def _valid_split_frames(datacfg: Union[str, DataConfig]) -> int:
    dc = datacfg if isinstance(datacfg, DataConfig) else \
        data_config_from_options(read_data_cfg(datacfg))
    return _count_list_lines(dc.valid)


def _bank_bytes(n_frames: int, out_shape: Tuple[int, int],
                batch: int) -> int:
    """u8 HBM footprint of an EvalBank: frames padded to a batch multiple."""
    padded = -(-max(n_frames, 1) // batch) * batch
    return padded * out_shape[0] * out_shape[1] * 3


def _hbm_free_bytes() -> Optional[int]:
    """Device-memory headroom (shared accounting: utils/memory.py)."""
    from .utils.memory import hbm_free_bytes
    return hbm_free_bytes()


def _resolve_eval_transfer(rc: "TrainRunConfig", need_bytes: int) -> str:
    """Resolve ``eval_transfer="auto"`` for one in-training eval pass.

    Policy (VERDICT r3 #4): the HBM bank is strictly better than streaming
    for the repeated eval cadence (reference ``train.py:395``) whenever it
    fits, so default to it — but preflight the device-memory budget first:
    bank bytes for the split(s) + >=1 GB activation headroom must fit the
    free HBM.  When tight, first evict the eval-bank LRU (stale banks from
    earlier splits), then fall back to streaming "rgb" for THIS pass (the
    next eval re-resolves — transient pressure doesn't stick the run in
    streaming mode).
    """
    if rc.eval_transfer != "auto":
        return rc.eval_transfer
    if jax.process_count() > 1:
        # the choice must be identical on every host (a per-host HBM read
        # can diverge); process 0 decides, everyone follows
        from jax.experimental import multihost_utils
        pick = _resolve_eval_transfer_local(rc, need_bytes) \
            if jax.process_index() == 0 else "rgb"
        code = multihost_utils.broadcast_one_to_all(
            np.int32(0 if pick == "bank" else 1))
        return "bank" if int(code) == 0 else "rgb"
    return _resolve_eval_transfer_local(rc, need_bytes)


def _resolve_eval_transfer_local(rc: "TrainRunConfig",
                                 need_bytes: int) -> str:
    free = _hbm_free_bytes()
    if free is None:
        return "bank"
    need = need_bytes + _EVAL_BANK_HEADROOM
    if need <= free:
        return "bank"
    from .data import eval_bank as _EB
    cached = sum(b.nbytes() for b in _EB._CACHE.values())
    if cached and need <= free + cached:
        _log(f"eval_transfer=auto: evicting {cached >> 20} MB of cached "
             "eval banks to fit this split")
        _EB.clear_cache()
        return "bank"
    _log(f"eval_transfer=auto: bank needs {need >> 20} MB but only "
         f"{free >> 20} MB HBM free — streaming rgb for this eval")
    return "rgb"


def _resolve_fused_stem(rc: "TrainRunConfig") -> bool:
    """Auto policy for the fused Pallas stem (see TrainRunConfig.fused_stem).

    Under a sharded mesh the stem runs as a shard_map over the data axis
    with psum'd BN statistics (``ops/stem.stem_conv_bn_pool_train_sharded``);
    the per-device batch gate lives in ``stem_supported``.
    """
    if rc.fused_stem is not None:
        return rc.fused_stem
    return (rc.compute_dtype == jnp.bfloat16
            and jax.default_backend() == "tpu")


def run_training(datacfg: str, modelcfg: Union[str, DarknetSpec],
                 initweightfile: Optional[str] = None,
                 pretrain_num_epochs: int = 15,
                 run_cfg: Optional[TrainRunConfig] = None) -> Dict[str, object]:
    """Single-object training (reference ``train.py`` main).

    Returns {"state": final TrainState, "best_acc": float, "history": dict}.
    """
    rc = run_cfg or TrainRunConfig()
    dcfg = data_config_from_options(read_data_cfg(datacfg))
    spec = load_spec(modelcfg)
    net = spec.net

    batch_size = net.batch
    with open(dcfg.train) as f:
        nsamples = sum(1 for ln in f if ln.strip())
    nbatches = nsamples / batch_size
    steps = [s * nbatches for s in net.steps]      # train.py:307
    scales = list(net.scales)
    max_epochs = rc.max_epochs_override or net.max_epochs

    backupdir = dcfg.backup or "backup"
    os.makedirs(backupdir, exist_ok=True)

    # model init / resume
    ckpt = None
    if rc.orbax_dir:
        from .checkpoint import OrbaxCheckpointer
        ckpt = OrbaxCheckpointer(rc.orbax_dir)
    state = None
    if rc.resume and ckpt is not None and ckpt.latest_step() is not None:
        state, _step = ckpt.restore()
        seen0 = int(jax.device_get(state.seen))
        _log(f"resumed from {rc.orbax_dir} at seen={seen0}")
    elif initweightfile:
        header, params, batch_stats = W.load_weights_until_last(
            spec, initweightfile)
        seen0 = 0  # reference resets model.seen = 0 after backbone load
    else:
        params, batch_stats = spec.init_params(jax.random.PRNGKey(rc.seed))
        seen0 = 0
    if state is None:
        params = jax.tree.map(jnp.asarray, params)
        batch_stats = jax.tree.map(jnp.asarray, batch_stats)
        state = init_train_state(params, batch_stats)
        state = state._replace(seen=jnp.asarray(seen0, jnp.int32))
    processed_batches = seen0 // batch_size
    init_epoch = seen0 // max(nsamples, 1)

    if rc.mesh is not None:
        dp = rc.mesh.shape.get("data", 1)
        if batch_size % max(dp, 1) != 0:
            raise ValueError(
                f"[net] batch={batch_size} must be divisible by the mesh's "
                f"data axis ({dp}) for data-parallel training")
        from .parallel.sharding import shard_train_state
        # every leaf incl. seen — a mixed state forces a one-off step
        # recompile on the 2nd call (see shard_train_state docstring)
        state = shard_train_state(spec, rc.mesh, state)

    loss_cfg = loss_config_from_spec(
        spec, pretrain_num_epochs=pretrain_num_epochs,
        im_width=dcfg.width, im_height=dcfg.height, mesh=rc.mesh)
    step = make_train_step(spec, loss_cfg,
                           weight_decay=net.decay * batch_size,
                           momentum=net.momentum,
                           compute_dtype=rc.compute_dtype,
                           fused_stem=_resolve_fused_stem(rc),
                           stem_mesh=rc.mesh)

    bg_files = get_all_files(rc.bg_dir) if os.path.isdir(rc.bg_dir) else []
    ds = PoseDataset(dcfg.train, train=True, bg_file_names=bg_files,
                     num_keypoints=spec.num_keypoints,
                     cache_decoded=rc.cache_decoded)
    loader_batch, seen0 = _multihost_local_shard(ds, batch_size, seen0,
                                                 rc.mesh)
    on_device = rc.loader_backend in ("device", "device_bank")
    if rc.loader_backend == "device_bank" and jax.process_count() > 1:
        raise ValueError(
            "device_bank is single-process (the global-batch assembly path "
            "expects host arrays); use the native/host loader under "
            "multi-host")
    loader = Loader(ds, loader_batch, schedule=SINGLE_SCHEDULE,
                    seen=seen0, num_workers=rc.num_workers, seed=rc.seed,
                    backend=rc.loader_backend, out_uint8=not on_device,
                    mesh=rc.mesh
                    if rc.loader_backend == "device_bank" else None)
    if rc.precompile_buckets:
        _precompile_buckets(step, state, SINGLE_SCHEDULE.all_widths,
                            loader_batch, 50 * (2 * spec.num_keypoints + 3),
                            rc, image_dtype=np.float32
                            if on_device else np.uint8)

    history: Dict[str, List] = {"training_iters": [], "training_losses": [],
                                "testing_iters": [], "testing_accuracies": [],
                                "testing_errors_pixel": [],
                                "testing_errors_angle": []}
    best_acc = -float("inf")

    pb_box = [processed_batches]
    state_box = [state]
    try:
        processed_batches, best_acc = _train_epochs(
            spec, state_box, loader, step, net, steps, scales,
            batch_size, nbatches, nsamples, init_epoch, max_epochs,
            pb_box, rc, ckpt, datacfg, backupdir, history, best_acc)
        state = state_box[0]
    except BaseException:
        # crash-safe: flush an emergency full-state checkpoint before
        # re-raising (the reference loses everything since the last
        # best-model save).  pb_box carries the CURRENT batch counter so
        # the rescued state lands at the latest step (not the stale
        # pre-loop value) and resume restores it.
        state = state_box[0]
        if ckpt is not None:
            # best-effort: with donate=True a device-side failure can leave
            # state buffers donated/poisoned, in which case the save itself
            # fails — log and let the ORIGINAL error propagate
            _log("emergency checkpoint on failure")
            try:
                try:
                    ckpt.save(pb_box[0], state, wait=True)
                except Exception:
                    ckpt.save(pb_box[0] + 1, state, wait=True)
                ckpt.close()
            except Exception as e:
                _log(f"emergency checkpoint failed: {e!r}")
        raise
    if ckpt is not None:
        ckpt.save(processed_batches, state, wait=True)
        ckpt.close()
    _save_final_if_unsaved(spec, state, best_acc, backupdir,
                           processed_batches * batch_size, rc)
    return {"state": state, "best_acc": best_acc, "history": history}


def _save_final_if_unsaved(spec, state, best_acc, backupdir, seen, rc=None):
    """A run that never reached the eval cadence (short runs, max_epochs
    overrides) would otherwise end with NO ``model.weights`` — the
    best-checkpoint rule (reference ``train.py:405-409``) only writes on a
    new best eval accuracy.  Write the final state once so every completed
    run yields a loadable artifact; untouched when a best save happened.
    Multi-host: only process 0 writes (replicated params are identical)."""
    if best_acc != -float("inf") or not backupdir:
        return
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    os.makedirs(backupdir, exist_ok=True)
    path = os.path.join(backupdir, "model.weights")
    _log(f"no eval ran; saving final weights to {path}")
    W.save_weights(spec, jax.device_get(state.params),
                   jax.device_get(state.batch_stats), path, seen=int(seen))


def _multihost_local_shard(ds: PoseDataset, batch_size: int, seen0: int,
                           mesh) -> Tuple[int, int]:
    """Multi-host: restrict ``ds`` to this process's dataset shard and divide
    the (global) cfg batch per host.  All hosts share the run seed, so
    shuffles and multi-scale width draws stay in lockstep — a requirement for
    assembling rectangular global batches.  ``seen`` is global but the
    loader's multi-scale clock runs in LOCAL samples, so the returned local
    seen keeps resume in the right bracket.  No-op single-host.
    """
    if mesh is None or jax.process_count() <= 1:
        return batch_size, seen0
    nproc = jax.process_count()
    if batch_size % nproc != 0:
        raise ValueError(f"[net] batch={batch_size} must be divisible by "
                         f"process_count={nproc} for multi-host training")
    from .parallel.multihost import process_local_indices
    idx = process_local_indices(len(ds))
    ds.lines = [ds.lines[i] for i in idx]
    return batch_size // nproc, seen0 // nproc


def _place_batch(mesh, images, labels):
    """Put one host batch on device per the run's mesh mode: multi-host
    global assembly, single-process mesh sharding, or plain transfer."""
    if mesh is not None:
        if jax.process_count() > 1:
            # multi-host: this process holds only its local shard;
            # assemble the logically-global batch-sharded array
            from .parallel.multihost import global_batch
            return global_batch(mesh, images, labels)
        from .parallel.sharding import shard_host_batch
        return shard_host_batch(mesh, images, labels)
    return jnp.asarray(images), jnp.asarray(labels)


def _precompile_buckets(step, state: TrainState, widths, loader_batch: int,
                        label_dim: int, rc,
                        image_dtype=np.uint8) -> None:
    """Pre-pay the per-bucket XLA compiles before epoch 0.

    Multi-scale training draws up to 20 input widths (reference brackets
    ``dataset.py:66-90``); each is a distinct executable that otherwise
    compiles lazily mid-epoch.  Executes the step once per width on a
    THROWAWAY zero state (donation would otherwise consume the real state's
    buffers) and dummy zero batches, logging per-bucket compile time.
    """
    # Mirror the live state's shardings leaf-for-leaf (incl. seen): a warm
    # state with any differently-placed leaf would compile executables the
    # real step calls can never reuse, defeating the precompile.
    warm = jax.tree.map(
        lambda x: jax.device_put(jnp.zeros_like(x), x.sharding), state)
    t_all = time.time()
    for w in widths:
        imgs = np.zeros((loader_batch, w, w, 3), image_dtype)
        lbls = np.zeros((loader_batch, label_dim), np.float32)
        imgs, lbls = _place_batch(rc.mesh, imgs, lbls)
        t0 = time.time()
        warm, stats = step(warm, imgs, lbls, np.float32(0.0), np.int32(0))
        jax.block_until_ready(stats["loss"])
        _log(f"precompiled bucket {w}px in {time.time() - t0:.1f}s")
    _log(f"precompiled {len(widths)} buckets in {time.time() - t_all:.1f}s")


def _run_epoch_batches(epoch, loader, step, net, steps, scales, batch_size,
                       nbatches, state_box, pb_box, rc, history):
    """Inner batch loop shared by both trainers: schedule LR per batch,
    shard/assemble batches per mesh mode, run the fused step, drain stats in
    chunks, honor the profiler window.  state_box/pb_box stay current per
    batch so crash handlers rescue the latest state."""
    state = state_box[0]
    processed_batches = pb_box[0]
    pending = []  # async stats fetch: (iter, device stats)
    for bidx, (images, labels) in enumerate(prefetch(loader)):
        lr = schedule_lr(net.learning_rate, processed_batches, steps, scales)
        if rc.profile_dir and processed_batches == rc.profile_steps[0]:
            jax.profiler.start_trace(rc.profile_dir)
        images, labels = _place_batch(rc.mesh, images, labels)
        state, stats = step(state, images, labels,
                            np.float32(lr / batch_size), np.int32(epoch))
        state_box[0] = state
        pending.append((epoch * int(np.ceil(nbatches)) + bidx, stats))
        processed_batches += 1
        pb_box[0] = processed_batches
        if rc.profile_dir and processed_batches == rc.profile_steps[1]:
            jax.block_until_ready(stats["loss"])
            jax.profiler.stop_trace()
        if len(pending) >= rc.log_every:
            _drain_stats(pending, history, epoch)
            pending = []
    _drain_stats(pending, history, epoch)
    return processed_batches


def _train_epochs(spec, state_box, loader, step, net, steps, scales,
                  batch_size, nbatches, nsamples, init_epoch, max_epochs,
                  pb_box, rc, ckpt, datacfg, backupdir, history,
                  best_acc):
    processed_batches = pb_box[0]
    for epoch in range(init_epoch, max_epochs):
        lr = schedule_lr(net.learning_rate, processed_batches, steps, scales)
        _log(f"epoch {epoch}, processed {epoch * nsamples} samples, lr {lr:f}")
        processed_batches = _run_epoch_batches(
            epoch, loader, step, net, steps, scales, batch_size, nbatches,
            state_box, pb_box, rc, history)
        state = state_box[0]

        if ckpt is not None and rc.orbax_every_epochs and \
                epoch % rc.orbax_every_epochs == 0:
            ckpt.save(processed_batches, state)

        if (epoch % rc.eval_every == 0) and (epoch > rc.eval_after):
            # Multi-host runs this too (reference cadence train.py:395-396):
            # every process executes the identical eval as one SPMD program
            # (batches assembled per-process, box picks replicated before the
            # host metric suite — _eval_pass; bank built via
            # make_array_from_callback — data/eval_bank.py), so acc/best_acc
            # stay bit-identical across hosts.  Only process 0 touches disk.
            transfer = _resolve_eval_transfer(rc, _bank_bytes(
                _valid_split_frames(datacfg),
                (spec.net.test_width, spec.net.test_height),
                rc.eval_batch_size))
            summary = run_validation(
                datacfg, spec, params=state.params,
                batch_stats=state.batch_stats,
                batch_size=rc.eval_batch_size, num_workers=rc.num_workers,
                compute_dtype=rc.compute_dtype, transfer=transfer,
                mesh=rc.mesh)   # sharded training → eval batches shard too
            acc = summary[rc.save_best_metric]
            history["testing_iters"].append(processed_batches)
            history["testing_accuracies"].append(acc)
            history["testing_errors_pixel"].append(summary["mean_err_2d"])
            history["testing_errors_angle"].append(summary["mean_err_angle"])
            if jax.process_index() == 0:
                np.savez(os.path.join(backupdir, "costs.npz"),
                         **{k: np.asarray(v) for k, v in history.items()})
            if acc > best_acc:
                best_acc = acc
                _log("best model so far!")
                if jax.process_index() == 0:
                    # params/stats replicate over "data", so every distinct
                    # shard has a process-0-addressable replica: device_get
                    # is legal here even on a multi-host mesh
                    _log(f"save weights to {backupdir}/model.weights")
                    W.save_weights(spec, jax.device_get(state.params),
                                   jax.device_get(state.batch_stats),
                                   os.path.join(backupdir, "model.weights"),
                                   seen=int(jax.device_get(state.seen)))
    return processed_batches, best_acc


def run_training_multi(datacfg: str, modelcfg: Union[str, DarknetSpec],
                       initweightfile: Optional[str] = None,
                       pretrain_num_epochs: int = 0,
                       eval_datacfgs: Optional[Sequence[str]] = None,
                       linemod_root: Optional[str] = None,
                       run_cfg: Optional[TrainRunConfig] = None
                       ) -> Dict[str, object]:
    """Multi-object OCCLUSION training (reference ``train_multi.py`` main).

    Deltas vs :func:`run_training` mirror the reference's: scene-synthesis
    augmentation over LINEMOD singles, milder multi-scale schedule, CE class
    loss via the spec's 13-class region block, eval every 20 epochs over the
    per-object occlusion datacfgs, best checkpoint on the mean of the last
    sweep's accuracies (the reference records each object's acc@50px,
    ``train_multi.py:277`` + ``417-421``).
    """
    from .data.synth_multi import MultiObjectSynthesizer, SynthConfig

    rc = run_cfg or TrainRunConfig(eval_every=20, eval_after=-1)
    dcfg = data_config_from_options(read_data_cfg(datacfg))
    spec = load_spec(modelcfg)
    net = spec.net

    batch_size = net.batch
    with open(dcfg.train) as f:
        train_lines = [ln.strip() for ln in f if ln.strip()]
    nsamples = len(train_lines)
    nbatches = nsamples / batch_size
    steps = [s * nbatches for s in net.steps]
    scales = list(net.scales)
    max_epochs = rc.max_epochs_override or net.max_epochs
    backupdir = dcfg.backup or "backup_multi"
    os.makedirs(backupdir, exist_ok=True)

    ckpt = None
    if rc.orbax_dir:
        from .checkpoint import OrbaxCheckpointer
        ckpt = OrbaxCheckpointer(rc.orbax_dir)
    if rc.resume and ckpt is not None and ckpt.latest_step() is not None:
        state, _step = ckpt.restore()
        _log(f"[multi] resumed from {rc.orbax_dir} at "
             f"seen={int(jax.device_get(state.seen))}")
    else:
        if initweightfile:
            _, params, batch_stats = W.load_weights_until_last(
                spec, initweightfile)
        else:
            params, batch_stats = spec.init_params(jax.random.PRNGKey(rc.seed))
        params = jax.tree.map(jnp.asarray, params)
        batch_stats = jax.tree.map(jnp.asarray, batch_stats)
        state = init_train_state(params, batch_stats)
    # resume derives schedule/epoch position from the restored seen counter
    # (the single-object driver's semantics; the reference's own resume
    # plumbing is dead code, train.py:341-346)
    seen0 = int(jax.device_get(state.seen))
    processed_batches = seen0 // batch_size
    init_epoch = seen0 // max(nsamples, 1)

    if rc.mesh is not None:
        dp = rc.mesh.shape.get("data", 1)
        if batch_size % max(dp, 1) != 0:
            raise ValueError(
                f"[net] batch={batch_size} must be divisible by the mesh's "
                f"data axis ({dp}) for data-parallel training")
        from .parallel.sharding import shard_train_state
        # every leaf incl. seen — a mixed state forces a one-off step
        # recompile on the 2nd call (see shard_train_state docstring)
        state = shard_train_state(spec, rc.mesh, state)

    loss_cfg = loss_config_from_spec(
        spec, pretrain_num_epochs=pretrain_num_epochs,
        im_width=dcfg.width, im_height=dcfg.height, multi=True,
        mesh=rc.mesh)
    step = make_train_step(spec, loss_cfg,
                           weight_decay=net.decay * batch_size,
                           momentum=net.momentum,
                           compute_dtype=rc.compute_dtype,
                           fused_stem=_resolve_fused_stem(rc),
                           stem_mesh=rc.mesh)

    if linemod_root is None:
        # reference hard-codes '../LINEMOD/<obj>/train.txt' relative to the
        # multi dir (image_multi.py:320); infer from the train list paths.
        linemod_root = os.path.dirname(os.path.dirname(
            os.path.dirname(train_lines[0])))
    synth = MultiObjectSynthesizer(SynthConfig(
        linemod_root=linemod_root, num_keypoints=spec.num_keypoints))
    bg_files = get_all_files(rc.bg_dir) if os.path.isdir(rc.bg_dir) else []
    ds = PoseDataset(dcfg.train, train=True, bg_file_names=bg_files,
                     aug=AugmentConfig.multi(),
                     num_keypoints=spec.num_keypoints, synthesizer=synth,
                     cache_decoded=rc.cache_decoded)
    loader_batch, seen0 = _multihost_local_shard(ds, batch_size, seen0,
                                                 rc.mesh)
    multi_backend = rc.loader_backend
    if multi_backend in ("native", "device", "device_bank"):
        raise ValueError(
            f"loader_backend={multi_backend!r} does not cover the "
            "scene-synthesis path; use 'python' (host synth, default) or "
            "'device_synth' (HBM-resident bank, data/device_synth.py)")
    if multi_backend == "auto":
        multi_backend = "python"
    on_device = multi_backend == "device_synth"
    if on_device and jax.process_count() > 1:
        raise ValueError(
            "device_synth is single-process (the global-batch assembly path "
            "expects host arrays); use the host synthesizer under multi-host")
    loader = Loader(ds, loader_batch, schedule=MULTI_SCHEDULE, seen=seen0,
                    num_workers=rc.num_workers, seed=rc.seed,
                    backend=multi_backend, out_uint8=not on_device,
                    mesh=rc.mesh if on_device else None,
                    synth_attempts=rc.synth_attempts,
                    synth_propose_scale=rc.synth_propose_scale)
    if rc.precompile_buckets:
        _precompile_buckets(step, state, MULTI_SCHEDULE.all_widths,
                            loader_batch, 50 * (2 * spec.num_keypoints + 3),
                            rc, image_dtype=np.float32
                            if on_device else np.uint8)

    history: Dict[str, List] = {"training_iters": [], "training_losses": [],
                                "testing_iters": [], "testing_accuracies": []}
    best_acc = -float("inf")

    state_box = [state]
    pb_box = [processed_batches]
    try:
        for epoch in range(init_epoch, max_epochs):
            processed_batches, best_acc = _multi_epoch_body(
                epoch, spec, state_box, loader, step, net, steps,
                scales, batch_size, nbatches, pb_box, rc, ckpt,
                eval_datacfgs, backupdir, history, best_acc)
            state = state_box[0]
    except BaseException:
        state = state_box[0]
        if ckpt is not None:
            # best-effort, per-batch step id (see run_training's handler)
            _log("[multi] emergency checkpoint on failure")
            try:
                try:
                    ckpt.save(pb_box[0], state, wait=True)
                except Exception:
                    ckpt.save(pb_box[0] + 1, state, wait=True)
                ckpt.close()
            except Exception as e:
                _log(f"[multi] emergency checkpoint failed: {e!r}")
        raise
    if ckpt is not None:
        ckpt.save(processed_batches, state, wait=True)
        ckpt.close()
    _save_final_if_unsaved(spec, state, best_acc, backupdir,
                           processed_batches * batch_size, rc)
    return {"state": state, "best_acc": best_acc, "history": history}


def _multi_epoch_body(epoch, spec, state_box, loader, step, net, steps,
                      scales, batch_size, nbatches, pb_box, rc,
                      ckpt, eval_datacfgs, backupdir, history, best_acc):
    processed_batches = pb_box[0]
    lr = schedule_lr(net.learning_rate, processed_batches, steps, scales)
    _log(f"[multi] epoch {epoch}, lr {lr:f}")
    processed_batches = _run_epoch_batches(
        epoch, loader, step, net, steps, scales, batch_size, nbatches,
        state_box, pb_box, rc, history)
    state = state_box[0]

    if ckpt is not None and rc.orbax_every_epochs and \
            epoch % rc.orbax_every_epochs == 0:
        ckpt.save(processed_batches, state)

    if eval_datacfgs and (epoch % rc.eval_every == 0) \
            and (epoch > rc.eval_after):
        # multi-host capable: same SPMD-eval + process-0-writes discipline
        # as the single trainer (_train_epochs)
        # the sweep accumulates one bank per object in the LRU — budget all
        out_shape = (spec.net.test_width, spec.net.test_height)
        need = sum(_bank_bytes(_valid_split_frames(dc), out_shape,
                               rc.eval_batch_size) for dc in eval_datacfgs)
        transfer = _resolve_eval_transfer(rc, need)
        accs = []
        for dc in eval_datacfgs:
            res = run_validation_multi(
                dc, spec, params=state.params,
                batch_stats=state.batch_stats,
                batch_size=rc.eval_batch_size,
                num_workers=rc.num_workers,
                compute_dtype=rc.compute_dtype, transfer=transfer,
                mesh=rc.mesh)   # sharded training → eval batches shard too
            accs.append(res["acc_table"][50])   # reference records acc@50
        mean_acc = float(np.mean(accs)) if accs else float("nan")
        history["testing_iters"].append(processed_batches)
        history["testing_accuracies"].append(mean_acc)
        if jax.process_index() == 0:
            np.savez(os.path.join(backupdir, "costs.npz"),
                     **{k: np.asarray(v) for k, v in history.items()})
        if mean_acc > best_acc:
            best_acc = mean_acc
            _log("[multi] best model so far!")
            if jax.process_index() == 0:
                W.save_weights(spec, jax.device_get(state.params),
                               jax.device_get(state.batch_stats),
                               os.path.join(backupdir, "model.weights"),
                               seen=int(jax.device_get(state.seen)))
    return processed_batches, best_acc


def _drain_stats(pending, history, epoch):
    """Fetch queued device stats (one sync for the whole chunk)."""
    if not pending:
        return
    fetched = jax.device_get([(it, s) for it, s in pending])
    for it, s in fetched:
        loss = float(s["loss"])
        history["training_iters"].append(int(it))
        history["training_losses"].append(loss)
    it, s = fetched[-1]
    _log(f"epoch {epoch} iter {int(it)}: loss {float(s['loss']):.4f} "
         f"(x {float(s['loss_x']):.3f} y {float(s['loss_y']):.3f} "
         f"conf {float(s['loss_conf']):.3f} cls {float(s['loss_cls']):.3f}) "
         f"nGT {int(s['nGT'])} correct {int(s['nCorrect'])} "
         f"proposals {int(s['nProposals'])}")
