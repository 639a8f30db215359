import os

import numpy as np
import pytest

from singleshotpose_tpu.models.darknet import ConvSpec, DarknetSpec
from singleshotpose_tpu.weights import (
    WeightsHeader,
    load_weights,
    load_weights_until_last,
    resume_counters,
    save_weights,
)

REF_CFG = "/root/reference/cfg/yolo-pose.cfg"

TINY_CFG = """\
[net]
batch=2
height=64
width=64
channels=3
num_keypoints=9
test_width=64
test_height=64

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
filters=20
size=1
stride=1
pad=1
activation=linear

[region]
anchors =
classes=1
coords=18
num=1
object_scale=5
noobject_scale=0.1
thresh = .6
"""


@pytest.fixture
def tiny_spec(tmp_path):
    p = tmp_path / "tiny.cfg"
    p.write_text(TINY_CFG)
    return DarknetSpec.from_cfg(str(p))


def reference_order_buffer(spec):
    """Build a deterministic flat float buffer in darknet on-disk order, plus
    the expected param arrays, constructed independently of the codec."""
    rng = np.random.RandomState(0)
    chunks = []
    expected_params = {}
    expected_stats = {}
    for lspec in spec.layers:
        if not isinstance(lspec, ConvSpec):
            continue
        n, ci, k = lspec.filters, lspec.in_filters, lspec.size
        if lspec.batch_normalize:
            beta = rng.randn(n).astype(np.float32)
            gamma = rng.randn(n).astype(np.float32)
            mean = rng.randn(n).astype(np.float32)
            var = rng.rand(n).astype(np.float32) + 0.5
            w_oihw = rng.randn(n, ci, k, k).astype(np.float32)
            chunks += [beta, gamma, mean, var, w_oihw.ravel()]
            expected_params[lspec.name] = {
                "bias": beta, "scale": gamma,
                "w": w_oihw.transpose(2, 3, 1, 0)}
            expected_stats[lspec.name] = {"mean": mean, "var": var}
        else:
            b = rng.randn(n).astype(np.float32)
            w_oihw = rng.randn(n, ci, k, k).astype(np.float32)
            chunks += [b, w_oihw.ravel()]
            expected_params[lspec.name] = {"b": b, "w": w_oihw.transpose(2, 3, 1, 0)}
    return np.concatenate(chunks), expected_params, expected_stats


def test_load_bit_exact(tiny_spec, tmp_path):
    buf, exp_p, exp_st = reference_order_buffer(tiny_spec)
    path = tmp_path / "w.weights"
    header = np.array([0, 2, 0, 1234], dtype=np.int32)
    with open(path, "wb") as fp:
        header.tofile(fp)
        buf.tofile(fp)

    hdr, params, stats = load_weights(tiny_spec, str(path))
    assert hdr.seen == 1234
    for name, p in exp_p.items():
        for key, arr in p.items():
            np.testing.assert_array_equal(np.asarray(params[name][key]), arr)
    for name, st in exp_st.items():
        for key, arr in st.items():
            np.testing.assert_array_equal(np.asarray(stats[name][key]), arr)


def test_roundtrip_bit_exact(tiny_spec, tmp_path):
    buf, _, _ = reference_order_buffer(tiny_spec)
    p1 = tmp_path / "a.weights"
    with open(p1, "wb") as fp:
        np.array([0, 2, 0, 77], dtype=np.int32).tofile(fp)
        buf.tofile(fp)
    hdr, params, stats = load_weights(tiny_spec, str(p1))
    p2 = tmp_path / "b.weights"
    save_weights(tiny_spec, params, stats, str(p2), seen=hdr.seen, header=hdr)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_load_until_last_skips_head(tiny_spec, tmp_path):
    """Backbone-only file (all convs except the last) must load under a
    different head; the head stays freshly initialized."""
    # build a buffer that only covers the first two conv layers
    buf, exp_p, _ = reference_order_buffer(tiny_spec)
    conv_specs = [l for l in tiny_spec.layers if isinstance(l, ConvSpec)]
    head = conv_specs[-1]
    head_count = head.filters + head.filters * head.in_filters * head.size ** 2
    backbone = buf[:-head_count]
    path = tmp_path / "bb.weights"
    with open(path, "wb") as fp:
        np.array([0, 2, 0, 0], dtype=np.int32).tofile(fp)
        backbone.tofile(fp)

    hdr, params, stats = load_weights_until_last(tiny_spec, str(path))
    np.testing.assert_array_equal(
        np.asarray(params["conv_1"]["w"]), exp_p["conv_1"]["w"])
    np.testing.assert_array_equal(
        np.asarray(params["conv_2"]["w"]), exp_p["conv_2"]["w"])
    # head present (fresh init), different from the reference-order buffer
    assert params[head.name]["w"].shape == (1, 1, 16, 20)
    assert not np.array_equal(np.asarray(params[head.name]["w"]),
                              exp_p[head.name]["w"])


def test_resume_counters():
    hdr = WeightsHeader(np.array([0, 0, 0, 1000], dtype=np.int32))
    pb, ep = resume_counters(hdr, batch_size=8, nsamples=100)
    assert pb == 125
    assert ep == 10


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference cfg absent")
def test_full_cfg_weight_count():
    """Total float count for yolo-pose.cfg must match the analytic sum."""
    spec = DarknetSpec.from_cfg(REF_CFG)
    total = 0
    for l in spec.layers:
        if isinstance(l, ConvSpec):
            total += l.filters * l.in_filters * l.size ** 2
            total += 4 * l.filters if l.batch_normalize else l.filters
    # write zeros, reload, confirm the codec consumes exactly `total` floats
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".weights", delete=False) as fp:
        np.zeros(4, dtype=np.int32).tofile(fp)
        np.zeros(total, dtype=np.float32).tofile(fp)
        path = fp.name
    try:
        hdr, params, stats = load_weights(spec, path)
        loaded = sum(np.asarray(v).size for p in params.values() for v in p.values())
        loaded += sum(np.asarray(v).size for s in stats.values() for v in s.values())
        assert loaded == total
    finally:
        os.unlink(path)
