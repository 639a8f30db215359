import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from singleshotpose_tpu.models.darknet import DarknetSpec, fold_batchnorm
from singleshotpose_tpu.models import layers as L
from singleshotpose_tpu.weights import save_weights

REF_CFG = "/root/reference/cfg/yolo-pose.cfg"


def test_reorg_matches_darknet_ordering():
    """out[b,i,k,(j*s+l)*C+c] == x[b,i*s+j,k*s+l,c] (darknet.py:16-34)."""
    b, h, w, c, s = 2, 4, 6, 3, 2
    x = np.arange(b * h * w * c, dtype=np.float32).reshape(b, h, w, c)
    y = np.asarray(L.reorg(jnp.asarray(x), s))
    assert y.shape == (b, h // s, w // s, s * s * c)
    for bi in range(b):
        for i in range(h // s):
            for k in range(w // s):
                for j in range(s):
                    for l in range(s):
                        for ci in range(c):
                            assert y[bi, i, k, (j * s + l) * c + ci] == \
                                x[bi, i * s + j, k * s + l, ci]


def test_maxpool_stride1_shape_and_replicate_pad():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 5, 5, 2).astype(np.float32))
    y = L.max_pool_stride1(x)
    assert y.shape == x.shape
    # bottom-right corner equals max of the 2x2 replicate-padded window = x[-1,-1] vicinity
    xn = np.asarray(x)
    assert np.asarray(y)[0, 4, 4, 0] == xn[0, 4, 4, 0].max()


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference cfg absent")
def test_spec_compiles_reference_cfg():
    spec = DarknetSpec.from_cfg(REF_CFG)
    assert spec.net.num_keypoints == 9
    assert spec.region is not None and spec.region.classes == 1
    # 23 conv layers in yolo-pose.cfg
    assert len(spec.conv_specs()) == 23
    # final head 20 channels
    assert spec.conv_specs()[-1].filters == 20


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference cfg absent")
def test_forward_output_shape():
    spec = DarknetSpec.from_cfg(REF_CFG)
    params, stats = spec.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 416, 416, 3), jnp.float32)
    out = spec.apply(params, x, batch_stats=stats, train=False)
    assert out.shape == (1, 13, 13, 20)


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference cfg absent")
def test_forward_matches_reference_torch(reference_dir, tmp_path):
    """A/B the raw head tensor against the reference torch model loaded from a
    weights file our codec wrote — validates both the codec layout and every
    layer's numerics in one shot."""
    torch = pytest.importorskip("torch")

    spec = DarknetSpec.from_cfg(REF_CFG)
    params, stats = spec.init_params(jax.random.PRNGKey(42))
    # perturb BN stats so the test isn't trivially scale-invariant
    rng = np.random.RandomState(7)
    for name in stats:
        n = stats[name]["mean"].shape[0]
        stats[name] = {
            "mean": jnp.asarray(rng.randn(n).astype(np.float32) * 0.1),
            "var": jnp.asarray(rng.rand(n).astype(np.float32) + 0.5),
        }
    wfile = str(tmp_path / "ab.weights")
    save_weights(spec, params, stats, wfile, seen=0)

    sys.path.insert(0, reference_dir)
    try:
        import importlib
        ref_darknet = importlib.import_module("darknet")
        model = ref_darknet.Darknet(REF_CFG)
        model.load_weights(wfile)
        model.eval()
        img = rng.rand(1, 3, 128, 128).astype(np.float32)
        with torch.no_grad():
            ref_out = model(torch.from_numpy(img)).numpy()  # NCHW (1,20,4,4)
    finally:
        sys.path.remove(reference_dir)

    x = jnp.asarray(img.transpose(0, 2, 3, 1))
    ours = np.asarray(spec.apply(params, x, batch_stats=stats, train=False))
    ours_nchw = ours.transpose(0, 3, 1, 2)
    assert ours_nchw.shape == ref_out.shape
    np.testing.assert_allclose(ours_nchw, ref_out, rtol=1e-3, atol=1e-3)

    # folded-BN fast path agrees with the unfolded path
    folded = fold_batchnorm(spec, params, stats)
    fast = np.asarray(spec.apply_folded(folded, x)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(fast, ref_out, rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference cfg absent")
def test_train_mode_bn_updates_stats():
    spec = DarknetSpec.from_cfg(REF_CFG)
    params, stats = spec.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32))
    out, new_stats = spec.apply(params, x, batch_stats=stats, train=True)
    assert out.shape == (2, 2, 2, 20)
    # running stats moved toward batch stats
    changed = any(
        not np.allclose(np.asarray(new_stats[k]["mean"]), np.asarray(stats[k]["mean"]))
        for k in stats)
    assert changed


def test_bn_preserves_input_dtype_bf16_activation_path():
    """Under compute_dtype=bfloat16 the post-conv path (BN out, pools)
    must stay bf16 — the f32 promotion this guards against doubled HBM
    traffic on every train-mode activation and its backward residual
    (batch-8 train step 18.5 -> 15.1 ms on v5e when fixed)."""
    rng = np.random.RandomState(0)
    x16 = jnp.asarray(rng.rand(2, 8, 8, 4), jnp.bfloat16)
    s = jnp.ones(4, jnp.float32)
    b = jnp.zeros(4, jnp.float32)
    m = jnp.zeros(4, jnp.float32)
    v = jnp.ones(4, jnp.float32)
    assert L.batch_norm(x16, s, b, m, v).dtype == jnp.bfloat16
    y, nm, nv = L.batch_norm_train(x16, s, b, m, v)
    assert y.dtype == jnp.bfloat16
    assert nm.dtype == jnp.float32 and nv.dtype == jnp.float32  # stats f32
    # f32 inputs keep f32 (inference/fold paths unchanged)
    x32 = x16.astype(jnp.float32)
    assert L.batch_norm(x32, s, b, m, v).dtype == jnp.float32
    # numerics: bf16 result equals the f32 computation rounded once
    ref = (x32 * 1.0 + 0.0).astype(jnp.bfloat16)
    got = L.batch_norm(x16, s, b, m + 0, v * (1 - L.BN_EPS))  # inv==1 exactly
    assert jnp.allclose(got.astype(jnp.float32), ref.astype(jnp.float32),
                        rtol=1e-2)


def test_fold_batchnorm_jit_cache_matches_eager():
    """fold_batchnorm runs as one jitted executable per spec (darknet.py:
    _FOLD_CACHE) — eagerly it is ~90 tiny dispatches, which the in-training
    eval cadence pays on every eval epoch through the host<->device link.
    The jitted fold must be numerically identical to the eager impl and
    must reuse one cached executable per spec."""
    from singleshotpose_tpu.models import darknet as D

    spec = DarknetSpec.from_cfg(REF_CFG) if os.path.exists(REF_CFG) else None
    if spec is None:
        from singleshotpose_tpu.zoo import yolo_pose_single
        spec = yolo_pose_single()
    params, stats = spec.init_params(jax.random.PRNGKey(3))

    want = D._fold_batchnorm_impl(spec, params, stats)
    got = fold_batchnorm(spec, params, stats)
    assert set(got) == set(want)
    for name in want:
        for k in want[name]:
            np.testing.assert_allclose(np.asarray(got[name][k]),
                                       np.asarray(want[name][k]),
                                       rtol=1e-6, atol=1e-6)

    # same spec -> same cached executable (no growth); fresh values still fold
    fn = D._FOLD_CACHE[spec]
    params2, stats2 = spec.init_params(jax.random.PRNGKey(4))
    got2 = fold_batchnorm(spec, params2, stats2)
    assert D._FOLD_CACHE[spec] is fn
    name = next(n for n in got2 if "w" in got2[n])
    assert not np.allclose(np.asarray(got2[name]["w"]),
                           np.asarray(got[name]["w"]))
