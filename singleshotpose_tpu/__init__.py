"""singleshotpose_tpu — TPU-native single-shot 6D object pose estimation.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
microsoft/singleshotpose (Tekin, Sinha & Fua, CVPR 2018): a YOLOv2-style
Darknet-19 network regressing 2D projections of an object's 3D bounding-box
keypoints from a single RGB image, with on-device batched PnP pose recovery,
LINEMOD (single-object) and OCCLUSION (multi-object) training/eval, bit-exact
darknet ``.weights`` IO, and data-parallel scale-out over a TPU mesh.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401

# Lazy top-level API: heavy submodules (jax tracing, native build) load on
# first attribute access so `import singleshotpose_tpu` stays instant.
_LAZY = {
    "DarknetSpec": ("singleshotpose_tpu.models.darknet", "DarknetSpec"),
    "fold_batchnorm": ("singleshotpose_tpu.models.darknet", "fold_batchnorm"),
    "quantize_folded": ("singleshotpose_tpu.models.quantize",
                        "quantize_folded"),
    "calibrate_activations": ("singleshotpose_tpu.models.quantize",
                              "calibrate_activations"),
    "apply_quantized": ("singleshotpose_tpu.models.quantize",
                        "apply_quantized"),
    "load_weights": ("singleshotpose_tpu.weights", "load_weights"),
    "load_weights_until_last": ("singleshotpose_tpu.weights",
                                "load_weights_until_last"),
    "save_weights": ("singleshotpose_tpu.weights", "save_weights"),
    "parse_cfg": ("singleshotpose_tpu.config", "parse_cfg"),
    "read_data_cfg": ("singleshotpose_tpu.config", "read_data_cfg"),
    "yolo_pose_single": ("singleshotpose_tpu.zoo", "yolo_pose_single"),
    "yolo_pose_multi": ("singleshotpose_tpu.zoo", "yolo_pose_multi"),
    "yolo_pose_pretrain": ("singleshotpose_tpu.zoo", "yolo_pose_pretrain"),
    "RegionLossConfig": ("singleshotpose_tpu.ops.losses", "RegionLossConfig"),
    "region_loss": ("singleshotpose_tpu.ops.losses", "region_loss"),
    "decode_grid": ("singleshotpose_tpu.ops.decode", "decode_grid"),
    "best_boxes": ("singleshotpose_tpu.ops.decode", "best_boxes"),
    "pnp": ("singleshotpose_tpu.ops.pnp", "pnp"),
    "pnp_batched": ("singleshotpose_tpu.ops.pnp", "pnp_batched"),
    "run_training": ("singleshotpose_tpu.drivers", "run_training"),
    "run_validation": ("singleshotpose_tpu.drivers", "run_validation"),
    "run_training_multi": ("singleshotpose_tpu.drivers",
                           "run_training_multi"),
    "run_validation_multi": ("singleshotpose_tpu.drivers",
                             "run_validation_multi"),
    "make_train_step": ("singleshotpose_tpu.training", "make_train_step"),
    "init_train_state": ("singleshotpose_tpu.training", "init_train_state"),
    "make_mesh": ("singleshotpose_tpu.parallel.sharding", "make_mesh"),
    "make_serving_fn": ("singleshotpose_tpu.serving", "make_serving_fn"),
    "export_serving": ("singleshotpose_tpu.serving", "export_serving"),
    "load_serving": ("singleshotpose_tpu.serving", "load_serving"),
    "aot_serving": ("singleshotpose_tpu.serving", "aot_serving"),
    "save_exported": ("singleshotpose_tpu.serving", "save_exported"),
    "MicroBatcher": ("singleshotpose_tpu.serving", "MicroBatcher"),
}

__all__ = ["config", "__version__"] + sorted(_LAZY)


def __getattr__(name):
    import importlib

    if name in _LAZY:
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
