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

# ---------------------------------------------------------------------------
# sharded stem (shard_map over the data axis)
# ---------------------------------------------------------------------------


def _mesh(dp=4, mp=2):
    from singleshotpose_tpu.parallel.sharding import make_mesh
    return make_mesh(dp=dp, mp=mp)


def test_sharded_stem_matches_unsharded():
    """shard_map stem (psum'd BN stats) vs the single-device kernel: forward,
    batch statistics, and parameter gradients agree to f32-reduction-order
    tolerance on a 4x2 ("data","model") mesh."""
    from singleshotpose_tpu.ops.stem import stem_conv_bn_pool_train_sharded
    mesh = _mesh()
    img, w, scale, bias = _inputs(B=8, H=32, W=64, seed=8)

    p1, m1, v1 = stem_conv_bn_pool_train(img, w, scale, bias)
    p2, m2, v2 = stem_conv_bn_pool_train_sharded(img, w, scale, bias, mesh)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-5)
    # pooled is bf16: stats ULP noise can flip the last bf16 bit
    d = np.abs(np.asarray(p2, np.float32) - np.asarray(p1, np.float32))
    s = np.abs(np.asarray(p1, np.float32)).max() + 1e-9
    assert d.max() <= 0.01 * s, d.max()

    t = jnp.asarray(np.random.RandomState(9).randn(*p1.shape), jnp.float32)

    def loss_unsharded(w, scale, bias):
        p, _, _ = stem_conv_bn_pool_train(img, w, scale, bias)
        return (p.astype(jnp.float32) * t).sum()

    def loss_sharded(w, scale, bias):
        p, _, _ = stem_conv_bn_pool_train_sharded(img, w, scale, bias, mesh)
        return (p.astype(jnp.float32) * t).sum()

    g1 = jax.grad(loss_unsharded, argnums=(0, 1, 2))(w, scale, bias)
    g2 = jax.grad(loss_sharded, argnums=(0, 1, 2))(w, scale, bias)
    for name, a, b in zip(("dw", "dscale", "dbias"), g2, g1):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 2e-3, (name, rel)


def test_train_step_mesh_fused_stem_matches_single_device():
    """Full fused train step on the 4x2 mesh with fused_stem=True + stem_mesh
    == the same fused step single-device (SPMD correctness for the stem's
    shard_map + psum'd stats + transpose-psum'd parameter cotangents)."""
    import jax.numpy as jnp
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.parallel.sharding import (
        batch_stats_shardings, param_shardings, shard_host_batch)
    from singleshotpose_tpu.training import (TrainState, init_train_state,
                                             make_train_step)
    mesh = _mesh()
    spec = _tiny_spec()
    K = 9
    tgt = np.zeros((8, 50 * (2 * K + 3)), np.float32)
    rng = np.random.RandomState(0)
    for b in range(8):
        tgt[b, 1:2 * K + 1] = rng.uniform(0.2, 0.8, 2 * K)
        tgt[b, 2 * K + 1:2 * K + 3] = [0.3, 0.4]
    imgs_h = np.random.RandomState(3).rand(8, 32, 32, 3).astype(np.float32)

    cfg = RegionLossConfig.single()
    params, bstats = spec.init_params(jax.random.PRNGKey(0))
    sharded = TrainState(
        jax.tree.map(jax.device_put, params, param_shardings(spec, mesh)),
        jax.tree.map(jax.device_put, bstats,
                     batch_stats_shardings(spec, mesh)),
        jax.tree.map(jnp.zeros_like,
                     jax.tree.map(jax.device_put, params,
                                  param_shardings(spec, mesh))),
        jnp.asarray(0, jnp.int32))
    step_mesh = make_train_step(spec, cfg, weight_decay=0.002, momentum=0.9,
                                compute_dtype=jnp.bfloat16, donate=False,
                                fused_stem=True, stem_mesh=mesh)
    imgs, tgt_s = shard_host_batch(mesh, imgs_h, tgt)
    s2, stats2 = step_mesh(sharded, imgs, tgt_s, 0.00025, 100)

    step_one = make_train_step(spec, cfg, weight_decay=0.002, momentum=0.9,
                               compute_dtype=jnp.bfloat16, donate=False,
                               fused_stem=True)
    params1, bstats1 = spec.init_params(jax.random.PRNGKey(0))
    s1, stats1 = step_one(init_train_state(params1, bstats1),
                          jnp.asarray(imgs_h), jnp.asarray(tgt), 0.00025, 100)

    np.testing.assert_allclose(float(stats2["loss"]), float(stats1["loss"]),
                               rtol=1e-3)
    # tolerance = the measured bf16 SPMD noise floor: the UNFUSED bf16 step
    # shows the same sharded-vs-single divergence (max abs 2.4e-4 on these
    # shapes — psum reduction order through bf16 activations); the tight
    # stem-semantics parity lives in test_sharded_stem_matches_unsharded
    for lname in ("conv_1", "conv_2"):
        np.testing.assert_allclose(
            np.asarray(s2.params[lname]["w"], np.float32),
            np.asarray(s1.params[lname]["w"], np.float32),
            rtol=0, atol=6e-4)
    # stem BN running stats took the sync-BN (global) update on both paths
    np.testing.assert_allclose(
        np.asarray(s2.batch_stats["conv_1"]["mean"]),
        np.asarray(s1.batch_stats["conv_1"]["mean"]), atol=1e-5)


def test_sharded_stem_gate_per_device_batch():
    """The batch gate applies per device: global B=128 over dp=4 is local 32
    (stem on); global B=128 unsharded is off; B=6 over dp=4 is off (uneven)."""
    from singleshotpose_tpu.zoo import yolo_pose_single
    net = yolo_pose_single()
    assert stem_supported(net, jnp.bfloat16, (128, 416, 416, 3),
                          data_shards=4)
    assert not stem_supported(net, jnp.bfloat16, (128, 416, 416, 3))
    assert not stem_supported(net, jnp.bfloat16, (6, 416, 416, 3),
                              data_shards=4)
    assert not stem_supported(net, jnp.bfloat16, (2, 416, 416, 3),
                              data_shards=4)
