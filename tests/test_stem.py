"""Fused Pallas stem (ops/stem.py) vs the unfused conv+BN+leaky+pool path.

Runs the kernels through the Pallas interpreter on the CPU backend (the
conftest virtual mesh env).  Reference semantics: the leading block of
``cfg/yolo-pose.cfg`` (reference ``darknet.py:150-169``), i.e. exactly
``max_pool(leaky(batch_norm_train(conv2d(x, w))), 2, 2)`` in bf16.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from singleshotpose_tpu.models import layers as L
from singleshotpose_tpu.models.darknet import DarknetSpec
from singleshotpose_tpu.ops import stem as stem_mod
from singleshotpose_tpu.ops.stem import stem_conv_bn_pool_train, stem_supported


@pytest.fixture(autouse=True)
def _interpret():
    stem_mod.FORCE_INTERPRET = True
    yield
    stem_mod.FORCE_INTERPRET = False


def _inputs(B=2, H=32, W=64, seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 32) * 0.2, jnp.float32)
    scale = jnp.asarray(0.5 + rng.rand(32), jnp.float32).at[3].set(-0.7)
    bias = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    return img, w, scale, bias


def _unfused(img, w, scale, bias):
    x = L.conv2d(img.astype(jnp.bfloat16), w.astype(jnp.bfloat16), 1, 1,
                 preferred_dtype=None)
    y, _, _ = L.batch_norm_train(x, scale, bias, jnp.zeros(32), jnp.ones(32))
    return L.max_pool(L.leaky_relu(y), 2, 2), x


def test_forward_matches_unfused():
    img, w, scale, bias = _inputs()
    pooled, bm, bv = stem_conv_bn_pool_train(img, w, scale, bias)
    ref, x = _unfused(img, w, scale, bias)
    x32 = x.astype(jnp.float32)
    rbm = x32.mean(axis=(0, 1, 2))
    rbv = (x32 ** 2).mean(axis=(0, 1, 2)) - rbm ** 2
    assert pooled.dtype == jnp.bfloat16
    assert pooled.shape == ref.shape
    np.testing.assert_allclose(np.asarray(bm), np.asarray(rbm), atol=1e-4)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(rbv), atol=1e-4)
    # bf16 output: allow one-ULP rounding flips at BN-stat noise boundaries
    d = np.abs(np.asarray(pooled, np.float32) - np.asarray(ref, np.float32))
    s = np.abs(np.asarray(ref, np.float32)).max()
    assert d.max() <= 0.01 * s + 1e-3, d.max()


def test_grads_match_unfused():
    img, w, scale, bias = _inputs(seed=1)
    t = jnp.asarray(np.random.RandomState(2).randn(2, 16, 32, 32),
                    jnp.float32)

    def lf(w, scale, bias):
        p, _, _ = stem_conv_bn_pool_train(img, w, scale, bias)
        return (p.astype(jnp.float32) * t).sum()

    def lu(w, scale, bias):
        p, _ = _unfused(img, w, scale, bias)
        return (p.astype(jnp.float32) * t).sum()

    gf = jax.grad(lf, argnums=(0, 1, 2))(w, scale, bias)
    gu = jax.grad(lu, argnums=(0, 1, 2))(w, scale, bias)
    for name, a, b, tol in zip(("dw", "dscale", "dbias"), gf, gu,
                               (3e-2, 1e-3, 1e-3)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < tol, (name, rel)


def test_supported_gating():
    from singleshotpose_tpu.zoo import yolo_pose_single
    net = yolo_pose_single()
    assert stem_supported(net, jnp.bfloat16)
    assert not stem_supported(net, jnp.float32)
    assert not stem_supported(net, None)


def _tiny_spec():
    blocks = [
        {"type": "net", "batch": "2", "channels": "3", "height": "32",
         "width": "32"},
        {"type": "convolutional", "batch_normalize": "1", "filters": "32",
         "size": "3", "stride": "1", "pad": "1", "activation": "leaky"},
        {"type": "maxpool", "size": "2", "stride": "2"},
        {"type": "convolutional", "batch_normalize": "0", "filters": "20",
         "size": "1", "stride": "1", "pad": "0", "activation": "linear"},
        {"type": "region", "anchors": "1,1", "num": "1", "classes": "1",
         "coords": "18"},
    ]
    return DarknetSpec(blocks)


def test_apply_integration_fused_equals_unfused():
    spec = _tiny_spec()
    params, stats = spec.init_params(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    of, sf = spec.apply(params, img, batch_stats=stats, train=True,
                        compute_dtype=jnp.bfloat16, fused_stem=True)
    ou, su = spec.apply(params, img, batch_stats=stats, train=True,
                        compute_dtype=jnp.bfloat16, fused_stem=False)
    d = np.abs(np.asarray(of, np.float32) - np.asarray(ou, np.float32)).max()
    s = np.abs(np.asarray(ou, np.float32)).max() + 1e-9
    assert d <= 0.02 * s, (d, s)
    name = spec.layers[0].name
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(sf[name][k]),
                                   np.asarray(su[name][k]), atol=1e-4,
                                   rtol=1e-4)


def test_apply_falls_back_when_unsupported():
    # f32 compute dtype: fused_stem must silently no-op (identical path)
    spec = _tiny_spec()
    params, stats = spec.init_params(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.RandomState(4).rand(2, 32, 32, 3), jnp.float32)
    a, _ = spec.apply(params, img, batch_stats=stats, train=True,
                      compute_dtype=None, fused_stem=True)
    b, _ = spec.apply(params, img, batch_stats=stats, train=True,
                      compute_dtype=None, fused_stem=False)
    assert jnp.array_equal(a, b)


def test_serving_stem_matches_folded_path():
    from singleshotpose_tpu.ops.stem import stem_conv_pool_infer
    img, w, _, _ = _inputs(seed=5)
    b = jnp.asarray(np.random.RandomState(6).randn(32) * 0.2, jnp.float32)
    got = stem_conv_pool_infer(img, w, b)
    y = (L.conv2d(img.astype(jnp.bfloat16), w.astype(jnp.bfloat16), 1, 1,
                  preferred_dtype=None) + b).astype(jnp.bfloat16)
    ref = L.max_pool(L.leaky_relu(y), 2, 2)
    assert got.dtype == jnp.bfloat16 and got.shape == ref.shape
    d = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    assert d.max() <= 1e-2 * np.abs(np.asarray(ref, np.float32)).max() + 1e-3


def test_apply_folded_integration_serving_stem():
    from singleshotpose_tpu.models.darknet import fold_batchnorm
    spec = _tiny_spec()
    params, stats = spec.init_params(jax.random.PRNGKey(1))
    folded = fold_batchnorm(spec, params, stats)
    img = jnp.asarray(np.random.RandomState(7).rand(2, 32, 32, 3), jnp.float32)
    out_fused = spec.apply_folded(folded, img, compute_dtype=jnp.bfloat16,
                                  fused_stem=True)
    out_ref = spec.apply_folded(folded, img, compute_dtype=jnp.bfloat16)
    d = np.abs(np.asarray(out_fused, np.float32) - np.asarray(out_ref, np.float32)).max()
    s = np.abs(np.asarray(out_ref, np.float32)).max() + 1e-9
    assert d <= 0.02 * s, (d, s)
