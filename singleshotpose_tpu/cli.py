"""Command-line entry points mirroring the reference drivers.

  python -m singleshotpose_tpu.cli train       --datacfg --modelcfg --initweightfile --pretrain_num_epochs
  python -m singleshotpose_tpu.cli valid       --datacfg --modelcfg --weightfile [--quantize [Q.npz]] [--dp N]
  python -m singleshotpose_tpu.cli valid-multi --modelcfg --weightfile [--datacfgs ...]
  python -m singleshotpose_tpu.cli quantize    --datacfg --modelcfg --weightfile --out Q.npz
  python -m singleshotpose_tpu.cli export      --modelcfg --weightfile|--quantized --out M.sspx
  python -m singleshotpose_tpu.cli make-labels --mesh M.ply --poses P.npz --out labels/
  python -m singleshotpose_tpu.cli print-cfg   <cfgfile>

Flags match ``train.py:276-281``, ``valid.py:238-242``,
``valid_multi.py:160-177``, and ``python cfg.py <cfg>`` (``cfg.py:203-208``).
``--modelcfg`` also accepts zoo names (``yolo-pose``, ``yolo-pose-multi``,
``yolo-pose-pre``) so no cfg artifacts are required.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional, Sequence


def _require_file(path: Optional[str], what: str) -> None:
    if path and not os.path.exists(path):
        raise SystemExit(f"error: {what} not found: {path}")


def _resolve_model(modelcfg: str):
    from . import zoo
    builders = {"yolo-pose": zoo.yolo_pose_single,
                "yolo-pose-multi": zoo.yolo_pose_multi,
                "yolo-pose-pre": zoo.yolo_pose_pretrain}
    if modelcfg in builders:
        return builders[modelcfg]()
    return modelcfg


def _add_train_run_flags(p: argparse.ArgumentParser) -> None:
    """Shared beyond-reference training knobs (single + multi trainers)."""
    p.add_argument("--max_epochs", type=int, default=None,
                   help="override [net] max_epochs")
    p.add_argument("--bg_dir", type=str,
                   default="VOCdevkit/VOC2012/JPEGImages")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel over N devices (0 = single device)")
    p.add_argument("--orbax_dir", type=str, default=None,
                   help="enable Orbax full-state checkpoints here")
    p.add_argument("--resume", action="store_true",
                   help="resume from latest Orbax checkpoint in --orbax_dir")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="dump a jax.profiler trace of steps 5-10 here")
    p.add_argument("--cache_decoded", action="store_true",
                   help="RAM-cache decoded images across epochs")
    p.add_argument("--loader_backend", type=str, default="auto",
                   choices=["auto", "python", "native", "device",
                            "device_bank", "device_synth"],
                   help="train: auto/python/native/device/device_bank "
                        "(HBM-resident frame bank, augmented on TPU); "
                        "train-multi: auto/python (host synthesis) or "
                        "device_synth (HBM bank, scenes composited on TPU)")
    p.add_argument("--precompile_buckets", action="store_true",
                   help="compile every multi-scale bucket before epoch 0 "
                        "(no mid-epoch XLA compile stalls)")
    p.add_argument("--synth_attempts", type=int, default=None,
                   help="device_synth: parallel placement proposals per "
                        "companion (default: the host synthesizer's "
                        "max_attempts, exact drop-law parity; lower = "
                        "faster, fewer objects in crowded scenes)")
    p.add_argument("--synth_propose_scale", type=int, default=4,
                   help="device_synth: mask-overlap test resolution "
                        "divisor (4 = measured distribution-neutral at "
                        "~2x throughput; 1 = host's full-res ratio)")
    p.add_argument("--eval_transfer", type=str, default="auto",
                   choices=["auto", "rgb", "yuv420", "bank"],
                   help="in-training eval input path: rgb u8 batches, "
                        "yuv420 native-size planes (device converts), or "
                        "bank (test split decoded once into HBM — every "
                        "eval epoch after the first is link-free); auto "
                        "picks bank when it fits the HBM budget, else rgb")


def _mesh_from_dp(dp: int):
    if not dp:
        return None
    import jax
    from .parallel.sharding import make_mesh
    return make_mesh(jax.devices()[:dp], dp=dp, mp=1)


def _run_config_from_args(args, **overrides):
    from .drivers import TrainRunConfig
    kw = dict(bg_dir=args.bg_dir, max_epochs_override=args.max_epochs,
              mesh=_mesh_from_dp(args.dp), orbax_dir=args.orbax_dir,
              resume=args.resume, profile_dir=args.profile_dir,
              cache_decoded=args.cache_decoded,
              loader_backend=args.loader_backend,
              precompile_buckets=args.precompile_buckets,
              synth_attempts=args.synth_attempts,
              synth_propose_scale=args.synth_propose_scale,
              eval_transfer=args.eval_transfer)
    kw.update(overrides)
    return TrainRunConfig(**kw)


def cmd_train(argv: Sequence[str]) -> int:
    p = argparse.ArgumentParser(prog="ssp train",
                                description="SingleShotPose (TPU)")
    p.add_argument("--datacfg", type=str, default="cfg/ape.data")
    p.add_argument("--modelcfg", type=str, default="cfg/yolo-pose.cfg")
    p.add_argument("--initweightfile", type=str,
                   default="cfg/darknet19_448.conv.23")
    p.add_argument("--pretrain_num_epochs", type=int, default=15)
    _add_train_run_flags(p)
    args = p.parse_args(argv)
    _require_file(args.datacfg, "data config")
    _require_file(args.initweightfile or None, "initial weight file")

    from .drivers import run_training
    rc = _run_config_from_args(args)
    result = run_training(args.datacfg, _resolve_model(args.modelcfg),
                          args.initweightfile or None,
                          args.pretrain_num_epochs, rc)
    print(f"best accuracy: {result['best_acc']}")
    return 0


def cmd_train_multi(argv: Sequence[str]) -> int:
    p = argparse.ArgumentParser(prog="ssp train-multi",
                                description="SingleShotPose multi-object (TPU)")
    p.add_argument("--datacfg", type=str, default="cfg/occlusion.data")
    p.add_argument("--modelcfg", type=str, default="cfg/yolo-pose-multi.cfg")
    p.add_argument("--initweightfile", type=str,
                   default="backup_multi/init.weights")
    p.add_argument("--pretrain_num_epochs", type=int, default=0)
    p.add_argument("--linemod_root", type=str, default=None)
    p.add_argument("--eval_datacfgs", type=str, nargs="*", default=None)
    _add_train_run_flags(p)
    args = p.parse_args(argv)

    from .drivers import run_training_multi
    rc = _run_config_from_args(args, eval_every=20, eval_after=-1)
    eval_dcs = args.eval_datacfgs
    if eval_dcs is None:
        # reference sweep: train_multi.py:277-297
        eval_dcs = [f"cfg/{o}_occlusion.data"
                    for o in ("ape", "can", "cat", "duck", "driller", "glue")]
        eval_dcs = [dc for dc in eval_dcs if os.path.exists(dc)]
    result = run_training_multi(args.datacfg, _resolve_model(args.modelcfg),
                                args.initweightfile or None,
                                args.pretrain_num_epochs, eval_dcs,
                                args.linemod_root, rc)
    print(f"best accuracy: {result['best_acc']}")
    return 0


def cmd_valid(argv: Sequence[str]) -> int:
    p = argparse.ArgumentParser(prog="ssp valid")
    p.add_argument("--datacfg", type=str, default="cfg/ape.data")
    p.add_argument("--modelcfg", type=str, default="cfg/yolo-pose.cfg")
    p.add_argument("--weightfile", type=str,
                   default="backup/ape/model_backup.weights")
    p.add_argument("--orbax_dir", type=str, default=None,
                   help="evaluate from an Orbax full-state checkpoint "
                        "instead of --weightfile (the offline-eval path for "
                        "multi-host training runs)")
    p.add_argument("--step", type=int, default=None,
                   help="Orbax checkpoint step (default: latest)")
    p.add_argument("--save", action="store_true",
                   help="dump per-frame R/t/corners + predictions .mat")
    p.add_argument("--quantize", nargs="?", const=True, default=False,
                   metavar="QNPZ",
                   help="serve backbone convs in int8 (1.45x bf16 "
                        "throughput at batch 128): bare flag calibrates on the "
                        "first batch; pass a .npz from `ssp quantize` to "
                        "serve a pre-quantized artifact")
    p.add_argument("--dp", type=int, default=0,
                   help="shard eval batches over N devices (0 = single)")
    p.add_argument("--transfer", type=str, default="rgb",
                   choices=["rgb", "yuv420", "bank"],
                   help="input path: rgb u8 batches, yuv420 native-size "
                        "planes (device converts; fewest h2d bytes), or "
                        "bank (split decoded once into HBM; repeated evals "
                        "are link-free)")
    p.add_argument("--add_s", action="store_true",
                   help="score the 3D-transform metric as ADD-S (nearest-"
                        "neighbour vertex distance) — the standard protocol "
                        "for symmetric LINEMOD objects (eggbox, glue); "
                        "default is index-matched ADD for every object, "
                        "matching the reference eval")
    args = p.parse_args(argv)
    _require_file(args.datacfg, "data config")
    if isinstance(args.quantize, str):
        _require_file(args.quantize, "quantized artifact")

    from .drivers import run_validation
    spec = _resolve_model(args.modelcfg)
    kw = dict(save=args.save, quantize=args.quantize,
              transfer=args.transfer, mesh=_mesh_from_dp(args.dp),
              add_s=args.add_s)
    if isinstance(args.quantize, str):
        # pre-quantized .npz IS the serving artifact: no f32 weights needed
        run_validation(args.datacfg, spec, None, **kw)
    elif args.orbax_dir:
        from .checkpoint import OrbaxCheckpointer
        ckpt = OrbaxCheckpointer(args.orbax_dir)
        state, step = ckpt.restore(args.step)
        ckpt.close()
        print(f"evaluating Orbax checkpoint step {step} from {args.orbax_dir}")
        run_validation(args.datacfg, spec, params=state.params,
                       batch_stats=state.batch_stats, **kw)
    else:
        _require_file(args.weightfile, "weight file")
        run_validation(args.datacfg, spec, args.weightfile, **kw)
    return 0


def cmd_valid_multi(argv: Sequence[str]) -> int:
    p = argparse.ArgumentParser(prog="ssp valid-multi")
    p.add_argument("--modelcfg", type=str, default="cfg/yolo-pose-multi.cfg")
    p.add_argument("--weightfile", type=str,
                   default="backup_multi/model_backup.weights")
    p.add_argument("--datacfgs", type=str, nargs="*", default=None,
                   help="per-object occlusion .data files; default: the "
                        "reference's 6-object sweep under cfg/")
    p.add_argument("--datacfg", type=str, default=None,
                   help="a multi .data with valid<i>/mesh<i>/diam<i> keys "
                        "(e.g. occlusion.data): evals every listed object")
    p.add_argument("--quantize", action="store_true",
                   help="serve backbone convs in int8 (first-batch "
                        "calibration per object)")
    args = p.parse_args(argv)
    _require_file(args.weightfile, "weight file")

    from .drivers import (OCCLUSION_EVAL_OBJECTS, run_validation_multi,
                          run_validation_multi_sweep)
    spec = _resolve_model(args.modelcfg)
    if args.datacfg:
        _require_file(args.datacfg, "data config")
        run_validation_multi_sweep(args.datacfg, spec, args.weightfile,
                                   quantize=args.quantize)
        return 0
    datacfgs = args.datacfgs or [
        f"cfg/{obj}_occlusion.data" for obj in OCCLUSION_EVAL_OBJECTS]
    for dc in datacfgs:
        _require_file(dc, "data config")
        run_validation_multi(dc, spec, args.weightfile, class_id=None,
                             quantize=args.quantize)
    return 0


def cmd_quantize(argv: Sequence[str]) -> int:
    """Produce a deployable int8 serving artifact from darknet weights."""
    p = argparse.ArgumentParser(
        prog="ssp quantize",
        description="calibrate + quantize a trained net to an int8 .npz")
    p.add_argument("--datacfg", type=str, required=True,
                   help=".data whose valid list supplies calibration images")
    p.add_argument("--modelcfg", type=str, default="cfg/yolo-pose.cfg")
    p.add_argument("--weightfile", type=str, required=True)
    p.add_argument("--out", type=str, required=True, help="output .npz path")
    p.add_argument("--calib_images", type=int, default=32,
                   help="number of calibration images (one static batch)")
    p.add_argument("--act_scales", choices=("per_channel", "scalar"),
                   default="per_channel",
                   help="activation scale granularity: per_channel folds "
                        "per-input-channel ranges into the weights "
                        "(equalization; measured better worst-case accuracy "
                        "at identical serving cost), scalar is plain absmax")
    args = p.parse_args(argv)
    _require_file(args.datacfg, "data config")
    _require_file(args.weightfile, "weight file")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from . import weights as W
    from .config import data_config_from_options, read_data_cfg
    from .data.pipeline import Loader, PoseDataset
    from .models.darknet import fold_batchnorm
    from .models.quantize import (calibrate_activations, quantize_folded,
                                  save_quantized)

    spec = _resolve_model(args.modelcfg)
    from .drivers import load_spec
    spec = load_spec(spec)
    _, params, bstats = W.load_weights(spec, args.weightfile)
    folded = fold_batchnorm(spec, params, bstats)

    dcfg = data_config_from_options(read_data_cfg(args.datacfg))
    ds = PoseDataset(dcfg.valid, train=False,
                     num_keypoints=spec.num_keypoints)
    n = min(args.calib_images, len(ds))
    loader = Loader(ds, n, shuffle=False, schedule=None,
                    fixed_shape=(spec.net.test_width, spec.net.test_height),
                    num_workers=2, drop_last=False, out_uint8=True)
    images, _ = next(iter(loader))
    calib = jnp.asarray(np.asarray(images)).astype(jnp.float32) / 255.0
    amax = calibrate_activations(spec, folded, calib,
                                 per_channel=args.act_scales == "per_channel")
    qp = quantize_folded(spec, folded, amax)
    save_quantized(args.out, jax.device_get(qp))
    nq = sum(1 for v in qp.values() if "wq" in v)
    print(f"quantized {nq}/{len(qp)} conv layers on {n} calibration images "
          f"-> {args.out}")
    return 0


def cmd_make_labels(argv: Sequence[str]) -> int:
    """Create 21-float label files from a mesh + GT poses (the recipe the
    reference only documents, ``label_file_creation.md``)."""
    from .make_labels import main as run
    return run(argv)


def cmd_print_cfg(argv: Sequence[str]) -> int:
    from .config import parse_cfg, print_cfg
    if not argv:
        print("usage: ssp print-cfg <cfgfile>", file=sys.stderr)
        return 2
    print_cfg(parse_cfg(argv[0]))
    return 0


def cmd_export(argv: Sequence[str]) -> int:
    """Freeze a trained net into a portable StableHLO serving artifact."""
    from .serving import cmd_export as run
    return run(argv)


COMMANDS = {
    "train": cmd_train,
    "train-multi": cmd_train_multi,
    "valid": cmd_valid,
    "valid-multi": cmd_valid_multi,
    "quantize": cmd_quantize,
    "export": cmd_export,
    "make-labels": cmd_make_labels,
    "print-cfg": cmd_print_cfg,
}


def main(argv: Optional[Sequence[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0 if argv else 2
    cmd = COMMANDS.get(argv[0])
    if cmd is None:
        print(f"unknown command {argv[0]!r}; "
              f"choose from {sorted(COMMANDS)}", file=sys.stderr)
        return 2
    return cmd(argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
