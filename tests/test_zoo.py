"""Zoo builders must be layer-for-layer identical to the reference cfgs."""

import os

import pytest

from singleshotpose_tpu.config import parse_cfg
from singleshotpose_tpu.models.darknet import DarknetSpec
from singleshotpose_tpu.zoo import (
    yolo_pose_multi, yolo_pose_pretrain, yolo_pose_single)


def _assert_same_layers(ours: DarknetSpec, ref: DarknetSpec):
    assert len(ours.layers) == len(ref.layers)
    for a, b in zip(ours.layers, ref.layers):
        assert type(a) is type(b), (a, b)
    assert ours.out_filters == ref.out_filters
    pa, _ = ours.init_params(__import__("jax").random.PRNGKey(0))
    pb, _ = ref.init_params(__import__("jax").random.PRNGKey(0))
    shapes = lambda p: {k: {kk: vv.shape for kk, vv in v.items()}
                        for k, v in p.items()}
    assert shapes(pa) == shapes(pb)


@pytest.mark.parametrize("builder,relpath", [
    (yolo_pose_single, "cfg/yolo-pose.cfg"),
    (yolo_pose_multi, "multi_obj_pose_estimation/cfg/yolo-pose-multi.cfg"),
    (yolo_pose_pretrain, "cfg/yolo-pose-pre.cfg"),
])
def test_zoo_matches_reference_cfg(reference_dir, builder, relpath):
    ours = builder()
    ref = DarknetSpec(parse_cfg(os.path.join(reference_dir, relpath)))
    _assert_same_layers(ours, ref)
    if ref.region:
        assert ours.region.classes == ref.region.classes
        assert ours.region.num == ref.region.num
        assert ours.region.anchors == pytest.approx(ref.region.anchors)


def test_zoo_net_hyperparams_match(reference_dir):
    ours = yolo_pose_single()
    ref = DarknetSpec(parse_cfg(os.path.join(reference_dir, "cfg/yolo-pose.cfg")))
    for attr in ("batch", "learning_rate", "momentum", "decay", "steps",
                 "scales", "max_epochs", "num_keypoints", "conf_thresh",
                 "test_width", "test_height"):
        assert getattr(ours.net, attr) == getattr(ref.net, attr), attr
