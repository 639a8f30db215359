"""int8 post-training quantization (models/quantize.py).

Validates the serving-only int8 path against the bf16/f32 folded path: weight
codec round-trip bounds, head-tensor agreement, skip-layer policy, and decode
box agreement — the properties that make `--quantize` safe to offer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from singleshotpose_tpu.models import quantize as Q
from singleshotpose_tpu.models.darknet import DarknetSpec, fold_batchnorm
from singleshotpose_tpu.ops.decode import best_boxes, decode_grid
from singleshotpose_tpu.zoo import yolo_pose_single


def _tiny_spec():
    """4-conv pose-style net (K=9, C=1, 1 anchor, 20-ch head)."""
    blocks = [
        {"type": "net", "batch": "8", "channels": "3", "width": "64",
         "height": "64", "num_keypoints": "9"},
        {"type": "convolutional", "batch_normalize": "1", "filters": "16",
         "size": "3", "stride": "1", "pad": "1", "activation": "leaky"},
        {"type": "maxpool", "size": "2", "stride": "2"},
        {"type": "convolutional", "batch_normalize": "1", "filters": "32",
         "size": "3", "stride": "2", "pad": "1", "activation": "leaky"},
        {"type": "convolutional", "batch_normalize": "1", "filters": "64",
         "size": "3", "stride": "2", "pad": "1", "activation": "leaky"},
        {"type": "convolutional", "batch_normalize": "0", "filters": "20",
         "size": "1", "stride": "1", "pad": "1", "activation": "linear"},
        {"type": "region", "anchors": "", "classes": "1", "coords": "18",
         "num": "1", "object_scale": "5", "noobject_scale": "0.1",
         "thresh": "0.6"},
    ]
    return DarknetSpec(blocks)


@pytest.fixture(scope="module")
def tiny():
    spec = _tiny_spec()
    params, bstats = spec.init_params(jax.random.PRNGKey(3))
    # non-trivial BN stats so folding isn't an identity
    rng = np.random.RandomState(11)
    for name in bstats:
        n = bstats[name]["mean"].shape[0]
        bstats[name] = {"mean": jnp.asarray(rng.randn(n).astype(np.float32) * .1),
                        "var": jnp.asarray(rng.rand(n).astype(np.float32) + .5)}
    folded = fold_batchnorm(spec, params, bstats)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 64, 64, 3), jnp.float32)
    amax = Q.calibrate_activations(spec, folded, x, compute_dtype=None)
    qp = Q.quantize_folded(spec, folded, amax)
    return spec, folded, qp, amax, x


def test_calibration_covers_every_conv(tiny):
    spec, _, _, amax, _ = tiny
    assert set(amax) == {c.name for c in spec.conv_specs()}
    assert all(v > 0 for v in amax.values())


def test_weight_roundtrip_error_bounded(tiny):
    """|wq*sw - w| ≤ sw/2 per element (symmetric round-to-nearest)."""
    spec, folded, qp, _, _ = tiny
    for c in spec.conv_specs():
        p = qp[c.name]
        if "wq" not in p:
            continue
        w = np.asarray(folded[c.name]["w"], np.float32)
        deq = np.asarray(p["wq"], np.float32) * np.asarray(p["sw"])
        assert np.all(np.abs(deq - w) <= np.asarray(p["sw"]) * 0.5 + 1e-7)


def test_head_layer_skipped_by_default(tiny):
    spec, _, qp, _, _ = tiny
    head = spec.conv_specs()[-1].name
    assert "wq" not in qp[head] and "w" in qp[head]
    # every backbone conv IS quantized
    for c in spec.conv_specs()[:-1]:
        assert "wq" in qp[c.name], c.name


def test_quantized_forward_close_to_folded(tiny):
    spec, folded, qp, _, x = tiny
    ref = np.asarray(jax.jit(
        lambda p, x: spec.apply_folded(p, x, compute_dtype=None))(folded, x))
    out = np.asarray(jax.jit(
        lambda p, x: Q.apply_quantized(spec, p, x, compute_dtype=None))(qp, x))
    scale = np.abs(ref).mean()
    rel = np.abs(out - ref).mean() / scale
    assert rel < 0.03, f"relative head error {rel:.4f}"
    assert np.abs(out - ref).max() / scale < 0.3


def test_quantized_decode_box_agreement(tiny):
    """The served quantity is the decoded box: centroid within a fraction of
    a cell, confidence within a few percent."""
    spec, folded, qp, _, x = tiny
    K, C, nA = spec.num_keypoints, spec.num_classes, spec.num_anchors
    def run(fwd, p):
        head = jax.jit(fwd)(p, x).astype(jnp.float32)
        return np.asarray(best_boxes(decode_grid(head, K, C, nA)))
    ref = run(lambda p, x_: spec.apply_folded(p, x_, compute_dtype=None), folded)
    out = run(lambda p, x_: Q.apply_quantized(spec, p, x_, compute_dtype=None), qp)
    # grid-normalized keypoints: 0.05 grid cells ≈ 1.6 px at 416²
    assert np.abs(out[:, :2 * K] - ref[:, :2 * K]).max() < 0.05
    assert np.abs(out[:, 2 * K] - ref[:, 2 * K]).max() < 0.05  # det conf


def test_zero_absmax_layer_falls_back_to_float(tiny):
    spec, folded, _, amax, _ = tiny
    first = spec.conv_specs()[0].name
    qp = Q.quantize_folded(spec, folded, {**amax, first: 0.0})
    assert "wq" not in qp[first]


def test_full_zoo_net_quantizes(tiny):
    """The flagship yolo-pose net: quantize and run one small forward."""
    spec = yolo_pose_single()
    params, bstats = spec.init_params(jax.random.PRNGKey(0))
    folded = fold_batchnorm(spec, params, bstats)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    amax = Q.calibrate_activations(spec, folded, x, compute_dtype=None)
    qp = Q.quantize_folded(spec, folded, amax)
    ref = np.asarray(spec.apply_folded(folded, x, compute_dtype=None))
    out = np.asarray(Q.apply_quantized(spec, qp, x, compute_dtype=None))
    assert out.shape == ref.shape == (1, 2, 2, 20)
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.06, f"relative head error {rel:.4f} on 23-conv net"


def test_pool_commutation_bit_exact(tiny):
    """apply_quantized pre-quantizes before maxpools (int8 pooling); results
    must be BIT-EXACT vs the naive quantize-at-conv-input interpreter since
    max commutes with the monotone quantizer."""
    from singleshotpose_tpu.models import layers as L
    from singleshotpose_tpu.models.darknet import DarknetSpec

    spec, _, qp, _, x = tiny

    def naive_conv_fn(cspec, xin):
        p = qp[cspec.name]
        if "wq" not in p:
            return DarknetSpec._conv(cspec, xin, p["w"], None) + p["b"]
        xq = Q._quant_act(xin, p["sa"])
        y = L.conv2d(xq, p["wq"], cspec.stride, cspec.pad,
                     preferred_dtype=jnp.int32)
        return y.astype(jnp.float32) * (p["sa"] * p["sw"]) + p["b"]

    naive = np.asarray(jax.jit(
        lambda p, v: spec._walk(v, naive_conv_fn, p))(qp, x))
    fused = np.asarray(jax.jit(
        lambda p, v: Q.apply_quantized(spec, p, v, compute_dtype=None))(qp, x))
    np.testing.assert_array_equal(fused, naive)


def test_quantized_int8_pooling_in_graph(tiny):
    """The graph actually pools in int8: the lowered stablehlo reduce_window
    runs on i8 tensors (the pool-commutation optimization is in effect)."""
    spec, _, qp, _, x = tiny
    txt = jax.jit(
        lambda p, v: Q.apply_quantized(spec, p, v, compute_dtype=None)
    ).lower(qp, x).as_text()
    assert "reduce_window" in txt, "no reduce_window in lowered graph"
    # the i8 init scalar exists only when the pool itself runs on int8
    assert "tensor<i8>" in txt


def test_calibrate_percentile_option():
    """percentile calibration returns finite stats bounded by the absmax
    (documented-harmful-on-this-task knob — kept for nets where the
    activation tail is noise; models/quantize.calibrate_activations)."""
    import jax, jax.numpy as jnp, numpy as np
    from singleshotpose_tpu.models.darknet import fold_batchnorm
    from singleshotpose_tpu.models.quantize import calibrate_activations
    from singleshotpose_tpu.zoo import yolo_pose_single

    net = yolo_pose_single()
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    folded = fold_batchnorm(net, params, bstats)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    amax = calibrate_activations(net, folded, x)
    p999 = calibrate_activations(net, folded, x, percentile=99.9)
    assert set(p999) == set(amax)
    for k in amax:
        assert np.isfinite(p999[k]) and 0.0 <= p999[k] <= amax[k] + 1e-6


def test_per_channel_equalization_identity_and_agreement():
    """per_channel=True folds per-input-channel activation scales into the
    weights (y = sum (x/sa_c)(w*sa_c) identity).  The quantized head must
    agree with the folded f32 head at least as well as scalar-absmax on the
    same input, and the dequant must stay per-output (no Cin/Cout shape
    leak on non-square convs — quantize.apply_quantized scale rule)."""
    import jax, jax.numpy as jnp, numpy as np
    from singleshotpose_tpu.models.darknet import fold_batchnorm
    from singleshotpose_tpu.models.quantize import (apply_quantized,
        calibrate_activations, quantize_folded)
    from singleshotpose_tpu.zoo import yolo_pose_single

    net = yolo_pose_single()
    params, bstats = net.init_params(jax.random.PRNGKey(3))
    folded = fold_batchnorm(net, params, bstats)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)
    ref = net.apply_folded(folded, x, compute_dtype=None)

    def err(per_channel):
        amax = calibrate_activations(net, folded, x,
                                     per_channel=per_channel)
        q = quantize_folded(net, folded, amax)
        y = apply_quantized(net, q, x, compute_dtype=None)
        return float(jnp.mean(jnp.abs(y - ref)))

    e_scalar, e_perch = err(False), err(True)
    scale = float(jnp.mean(jnp.abs(ref))) + 1e-9
    assert e_perch / scale < 0.05
    assert e_perch <= e_scalar * 1.5    # never catastrophically worse


def test_per_channel_artifact_roundtrip_and_pool_commute(tiny, tmp_path):
    """Per-channel `sa` vectors survive the .npz artifact (`ssp quantize`
    default), and the deserialized net — including the int8 pool-commutation
    fast path, which divides by the vector sa BEFORE the pool — reproduces
    the in-process quantized head bit-exactly."""
    spec, folded, _, _, x = tiny
    amax = Q.calibrate_activations(spec, folded, x, compute_dtype=None,
                                   per_channel=True)
    qp = Q.quantize_folded(spec, folded, amax)
    assert any(v["sa"].ndim == 1 for v in qp.values() if "wq" in v)
    y = Q.apply_quantized(spec, qp, x, compute_dtype=None)

    path = str(tmp_path / "q_perch.npz")
    Q.save_quantized(path, jax.device_get(qp))
    qp2 = Q.load_quantized(path)
    y2 = Q.apply_quantized(spec, qp2, x, compute_dtype=None)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
