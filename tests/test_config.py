import os
import textwrap

import pytest

from singleshotpose_tpu.config import (
    DataConfig,
    data_config_from_options,
    format_cfg_table,
    net_config_from_block,
    parse_cfg,
    read_data_cfg,
    region_config_from_block,
)

REF_CFG = "/root/reference/cfg/yolo-pose.cfg"
REF_MULTI_CFG = "/root/reference/multi_obj_pose_estimation/cfg/yolo-pose-multi.cfg"


def write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_parse_cfg_basic(tmp_path):
    path = write(tmp_path, "net.cfg", """\
        [net]
        batch=8
        width=416
        # a comment
        height=416

        [convolutional]
        filters=32
        size=3
        stride=1
        pad=1
        activation=leaky

        [region]
        anchors =
        classes=1
        num=1
    """)
    blocks = parse_cfg(path)
    assert [b["type"] for b in blocks] == ["net", "convolutional", "region"]
    assert blocks[0]["batch"] == "8"
    # convolutional defaults batch_normalize=0
    assert blocks[1]["batch_normalize"] == "0"
    assert blocks[2]["anchors"] == ""


def test_parse_cfg_type_key_renamed(tmp_path):
    path = write(tmp_path, "c.cfg", """\
        [net]
        width=1
        [cost]
        type=sse
    """)
    blocks = parse_cfg(path)
    assert blocks[1]["_type"] == "sse"


def test_net_config_typed(tmp_path):
    path = write(tmp_path, "net.cfg", """\
        [net]
        batch=8
        height=416
        width=416
        channels=3
        num_keypoints=9
        momentum=0.9
        decay=0.0005
        max_epochs=500
        learning_rate=0.001
        steps=-1,80,160
        scales=0.1,0.1,0.1
        conf_thresh= 0.1
        test_width=672
        test_height=672
    """)
    net = net_config_from_block(parse_cfg(path)[0])
    assert net.batch == 8
    assert net.num_keypoints == 9
    assert net.steps == (-1, 80, 160)
    assert net.scales == (0.1, 0.1, 0.1)
    assert net.conf_thresh == 0.1
    assert net.test_width == 672


def test_read_data_cfg_defaults(tmp_path):
    path = write(tmp_path, "obj.data", """\
        train = train.txt
        valid = test.txt
        mesh = ape.ply
        diam = 0.103
        fx = 572.4114
        width = 640
    """)
    opts = read_data_cfg(path)
    assert opts["gpus"] == "0"
    assert opts["num_workers"] == "10"
    dc = data_config_from_options(opts)
    assert isinstance(dc, DataConfig)
    assert dc.diam == pytest.approx(0.103)
    assert dc.fx == pytest.approx(572.4114)
    assert dc.width == 640


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference cfg absent")
def test_reference_yolo_pose_cfg():
    blocks = parse_cfg(REF_CFG)
    net = net_config_from_block(blocks[0])
    assert net.width == net.height == 416
    assert net.num_keypoints == 9
    region = region_config_from_block(blocks[-1])
    assert region.classes == 1
    assert region.num == 1
    assert region.coords == 18
    assert region.anchors == ()
    assert region.object_scale == 5.0
    assert region.noobject_scale == 0.1
    # head: 1 anchor x (18 + 1 + 1) = 20 filters
    conv_blocks = [b for b in blocks if b["type"] == "convolutional"]
    assert int(conv_blocks[-1]["filters"]) == 20


@pytest.mark.skipif(not os.path.exists(REF_MULTI_CFG), reason="reference cfg absent")
def test_reference_multi_cfg():
    blocks = parse_cfg(REF_MULTI_CFG)
    region = region_config_from_block(blocks[-1])
    assert region.classes == 13
    assert region.num == 5
    assert len(region.anchors) == 10
    conv_blocks = [b for b in blocks if b["type"] == "convolutional"]
    assert int(conv_blocks[-1]["filters"]) == 5 * (18 + 1 + 13)


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference cfg absent")
def test_cfg_table_matches_reference_printer(reference_dir):
    """The shape-propagation table must equal the reference's print_cfg output."""
    import io
    import sys as _sys
    import contextlib

    _sys.path.insert(0, reference_dir)
    try:
        import importlib
        ref_cfg = importlib.import_module("cfg")
        blocks = parse_cfg(REF_CFG)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ref_cfg.print_cfg(ref_cfg.parse_cfg(REF_CFG))
        ref_out = buf.getvalue().rstrip("\n").replace(";", "")
        ours = format_cfg_table(blocks)
        assert ours.splitlines()[1:] == ref_out.splitlines()[1:]
    finally:
        _sys.path.remove(reference_dir)
