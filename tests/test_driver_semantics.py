"""Regression tests for driver semantics pinned by code review:
effective loss scales, per-GT-class eval picks, eval-forward caching."""

import numpy as np
import pytest

import jax.numpy as jnp

from singleshotpose_tpu.drivers import _eval_forward, loss_config_from_spec
from singleshotpose_tpu.ops.decode import best_boxes_per_class, decode_grid
from singleshotpose_tpu.zoo import yolo_pose_multi, yolo_pose_single


def test_loss_scales_follow_reference_not_cfg():
    """The reference hard-codes 1/5/1/1 + thresh 0.6 and ignores the cfg's
    noobject_scale=0.1 (region_loss.py:88-91); the driver must match."""
    spec = yolo_pose_single()
    assert spec.region.noobject_scale == pytest.approx(0.1)  # what cfg says
    cfg = loss_config_from_spec(spec, pretrain_num_epochs=15,
                                im_width=640, im_height=480)
    assert cfg.noobject_scale == 1.0       # what the reference actually does
    assert cfg.object_scale == 5.0
    assert cfg.coord_scale == 1.0 and cfg.class_scale == 1.0
    assert cfg.sil_thresh == 0.6

    honored = loss_config_from_spec(spec, pretrain_num_epochs=15,
                                    im_width=640, im_height=480,
                                    honor_cfg_scales=True)
    assert honored.noobject_scale == pytest.approx(0.1)


def test_best_boxes_per_class_matches_per_class_calls():
    from singleshotpose_tpu.ops.decode import best_box_for_class
    K, C, nA, H, W, B = 9, 13, 5, 4, 4, 2
    rng = np.random.RandomState(0)
    out = jnp.asarray(rng.randn(B, H, W, nA * (2 * K + 1 + C)), jnp.float32)
    decoded = decode_grid(out, K, C, nA)
    allc = np.asarray(best_boxes_per_class(decoded, 0.05))
    assert allc.shape == (B, C, 2 * K + 3)
    for c in (0, 3, 12):
        one = np.asarray(best_box_for_class(decoded, c, 0.05))
        np.testing.assert_allclose(allc[:, c], one, rtol=1e-6)


def test_eval_forward_cached_per_spec():
    spec = yolo_pose_single()
    f1 = _eval_forward(spec, jnp.bfloat16)
    f2 = _eval_forward(spec, jnp.bfloat16)
    assert f1 is f2                       # cache hit: no retrace per eval
    f3 = _eval_forward(spec, None)
    assert f3 is not f1                   # distinct per compute dtype
    other = yolo_pose_multi()
    assert _eval_forward(other, jnp.bfloat16) is not f1


def test_multi_gt_test_labels_decode_correctly(tmp_path):
    """Two GTs of different classes in one eval frame: per-row 21-stride
    padding keeps classes/corners aligned (the reference's contiguous
    packing would misread GT 1)."""
    from singleshotpose_tpu.data.pipeline import PoseDataset
    from singleshotpose_tpu.evaluate import gt_corner_boxes, truths_length
    from PIL import Image

    root = tmp_path / "obj"
    for d in ("JPEGImages", "labels"):
        (root / d).mkdir(parents=True)
    img = np.zeros((48, 64, 3), np.uint8)
    Image.fromarray(img).save(root / "JPEGImages" / "000000.png")
    lab = np.zeros((2, 21), np.float32)
    lab[0, 0] = 3
    lab[0, 1:19] = 0.25
    lab[1, 0] = 7
    lab[1, 1:19] = 0.75
    np.savetxt(root / "labels" / "000000.txt", lab)
    lst = tmp_path / "t.txt"
    lst.write_text(str(root / "JPEGImages" / "000000.png") + "\n")

    ds = PoseDataset(str(lst), train=False)
    label = ds.get_test_label(0)
    assert truths_length(label) == 2
    t = label.reshape(50, 21)
    assert t[0, 0] == 3 and t[1, 0] == 7          # classes aligned
    boxes = gt_corner_boxes(label)
    np.testing.assert_allclose(boxes[0], 0.25)
    np.testing.assert_allclose(boxes[1], 0.75)    # corners aligned
    assert (t[:2, 19:21] == 0).all()              # extents zero at eval


def test_valid_multi_sweep_on_generated_occlusion_artifacts(tmp_path, capsys):
    """End-to-end §2.3 artifact flow: zoo.occlusion_datacfg renders
    occlusion.data, valid-multi sweeps every listed object on it (reference
    flow: valid_multi.py over multi_obj_pose_estimation/cfg/occlusion.data)."""
    from PIL import Image
    from singleshotpose_tpu.cli import main as cli_main
    from singleshotpose_tpu.config import parse_cfg
    from singleshotpose_tpu.models.darknet import DarknetSpec
    from singleshotpose_tpu.weights import save_weights
    from singleshotpose_tpu.zoo import (LINEMOD_OBJECTS, _OCCLUSION_SWEEP,
                                        occlusion_datacfg)
    from test_drivers import TINY_CFG

    rng = np.random.RandomState(0)
    root = tmp_path / "LINEMOD"
    for obj in _OCCLUSION_SWEEP:
        cls = LINEMOD_OBJECTS.index(obj)
        od = root / obj
        (od / "JPEGImages").mkdir(parents=True)
        (od / "labels_occlusion").mkdir()
        paths = []
        for i in range(2):
            Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
                od / "JPEGImages" / f"{i:06d}.jpg")
            lab = np.zeros(21, np.float32)
            lab[0] = cls
            lab[1:19] = rng.uniform(0.3, 0.7, 18)
            np.savetxt(od / "labels_occlusion" / f"{i:06d}.txt", lab[None])
            paths.append(str(od / "JPEGImages" / f"{i:06d}.jpg"))
        (od / "test_occlusion.txt").write_text("\n".join(paths) + "\n")
        # mesh spanning a small box
        v = [(sx * .03, sy * .02, sz * .025) for sx in (-1, 1)
             for sy in (-1, 1) for sz in (-1, 1)]
        ply = ["ply", "format ascii 1.0", f"element vertex {len(v)}",
               "property float x", "property float y", "property float z",
               "element face 0", "property list uchar int vertex_indices",
               "end_header"] + [f"{a} {b} {c}" for a, b, c in v]
        (od / f"{obj}.ply").write_text("\n".join(ply) + "\n")

    occ = tmp_path / "occlusion.data"
    occ.write_text(occlusion_datacfg(linemod_root=str(root),
                                     backup_root=str(tmp_path / "backup")))

    # tiny 13-class multi net + a darknet-format checkpoint for the CLI
    cfg = tmp_path / "multi.cfg"
    cfg.write_text(TINY_CFG
                   .replace("width=128", "width=64")
                   .replace("height=128", "height=48")
                   .replace("filters=20", "filters=64")
                   .replace("classes=1", "classes=13")
                   .replace("anchors =", "anchors = 1.5, 2.2, 3.1, 4.0")
                   .replace("num=1", "num=2"))
    spec = DarknetSpec(parse_cfg(str(cfg)))
    import jax
    params, bstats = spec.init_params(jax.random.PRNGKey(0))
    wfile = str(tmp_path / "multi.weights")
    save_weights(spec, params, bstats, wfile, seen=0)

    rv = cli_main(["valid-multi", "--modelcfg", str(cfg),
                   "--weightfile", wfile, "--datacfg", str(occ)])
    assert rv == 0
    out = capsys.readouterr().out
    for obj in _OCCLUSION_SWEEP:
        assert f"Testing {obj}" in out
    assert out.count("Acc using 50 px 2D Projection") == len(_OCCLUSION_SWEEP)
