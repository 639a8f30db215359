"""Pallas kernel parity vs the XLA reference formulation (interpret mode on
the CPU test backend; the same kernel compiles for real on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from singleshotpose_tpu.ops.confidence import corner_confidences
from singleshotpose_tpu.ops.pallas_kernels import max_corner_confidence


def _reference(gt, valid, pred, im_w=640.0, im_h=480.0):
    confs = corner_confidences(gt[:, :, None, :], pred[:, None, :, :],
                               im_width=im_w, im_height=im_h)
    confs = jnp.where(jnp.asarray(valid)[:, :, None], confs, 0.0)
    return jnp.max(confs, axis=1)


@pytest.mark.parametrize("B,G,S,K", [(2, 50, 169, 9), (3, 50, 845, 9),
                                     (1, 7, 130, 9)])
def test_max_corner_confidence_matches_reference(B, G, S, K):
    rng = np.random.RandomState(0)
    gt = rng.uniform(0, 1, (B, G, 2 * K)).astype(np.float32)
    pred = rng.uniform(0, 1, (B, S, 2 * K)).astype(np.float32)
    valid = rng.rand(B, G) < 0.3

    ref = np.asarray(_reference(jnp.asarray(gt), valid, jnp.asarray(pred)))
    out = np.asarray(max_corner_confidence(
        jnp.asarray(gt), jnp.asarray(valid), jnp.asarray(pred),
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_close_predictions_give_high_confidence():
    """Cells whose prediction equals a valid GT should reach conf 1."""
    B, G, S, K = 1, 50, 169, 9
    rng = np.random.RandomState(1)
    gt = np.zeros((B, G, 2 * K), np.float32)
    gt[0, 0] = rng.uniform(0.4, 0.6, 2 * K)
    valid = np.zeros((B, G), bool)
    valid[0, 0] = True
    pred = rng.uniform(0, 1, (B, S, 2 * K)).astype(np.float32)
    pred[0, 42] = gt[0, 0]
    out = np.asarray(max_corner_confidence(
        jnp.asarray(gt), jnp.asarray(valid), jnp.asarray(pred),
        interpret=True))
    assert out[0, 42] == pytest.approx(1.0, abs=1e-4)
    # an all-invalid image gives zeros
    out0 = np.asarray(max_corner_confidence(
        jnp.asarray(gt), jnp.zeros((B, G), bool), jnp.asarray(pred),
        interpret=True))
    assert (out0 == 0).all()


def test_sharded_kernel_matches_unsharded():
    """shard_map wrapper over a ('data','model') mesh: bit-identical to the
    single-device kernel and to the XLA reference, on batch-sharded inputs."""
    from singleshotpose_tpu.ops.pallas_kernels import \
        max_corner_confidence_sharded
    from singleshotpose_tpu.parallel.sharding import batch_sharding, make_mesh

    B, G, S, K = 8, 50, 845, 9
    rng = np.random.RandomState(3)
    gt = rng.uniform(0, 1, (B, G, 2 * K)).astype(np.float32)
    pred = rng.uniform(0, 1, (B, S, 2 * K)).astype(np.float32)
    valid = (rng.rand(B, G) < 0.3).astype(np.float32)

    mesh = make_mesh(jax.devices()[:8], mp=2)
    gt_s = jax.device_put(gt, batch_sharding(mesh, 3))
    valid_s = jax.device_put(valid, batch_sharding(mesh, 2))
    pred_s = jax.device_put(pred, batch_sharding(mesh, 3))

    out_sharded = np.asarray(max_corner_confidence_sharded(
        gt_s, valid_s, pred_s, mesh, interpret=True))
    out_single = np.asarray(max_corner_confidence(
        jnp.asarray(gt), jnp.asarray(valid), jnp.asarray(pred),
        interpret=True))
    ref = np.asarray(_reference(jnp.asarray(gt), valid.astype(bool),
                                jnp.asarray(pred)))
    np.testing.assert_array_equal(out_sharded, out_single)
    np.testing.assert_allclose(out_sharded, ref, rtol=1e-5, atol=1e-6)


def test_mesh_training_with_pallas_kernel(monkeypatch):
    """Full sharded train step with the Pallas kernel ON (interpret mode):
    the shard_map wrapper composes with pjit/GSPMD end to end."""
    import functools

    import singleshotpose_tpu.ops.pallas_kernels as pk
    from singleshotpose_tpu.config import parse_cfg
    from singleshotpose_tpu.models.darknet import DarknetSpec
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.parallel.sharding import (
        batch_stats_shardings, make_mesh, param_shardings, shard_host_batch)
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from test_training import TINY_CFG, _tiny_target
    import tempfile

    orig = pk.max_corner_confidence
    monkeypatch.setattr(
        pk, "max_corner_confidence",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    with tempfile.NamedTemporaryFile("w", suffix=".cfg") as f:
        f.write(TINY_CFG)
        f.flush()
        net = DarknetSpec(parse_cfg(f.name))

    mesh = make_mesh(jax.devices()[:8], mp=2)
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(jax.device_put, params, param_shardings(net, mesh))
    bstats = jax.tree.map(jax.device_put, bstats,
                          batch_stats_shardings(net, mesh))
    state = init_train_state(params, bstats)

    rng = np.random.RandomState(0)
    images = rng.rand(8, 64, 64, 3).astype(np.float32)
    target = _tiny_target(8)

    # pallas ON via shard_map + mesh threading through RegionLossConfig
    cfg_p = RegionLossConfig.single(use_pallas=True, mesh=mesh)
    cfg_x = RegionLossConfig.single(use_pallas=False)
    with mesh:
        imgs, tgts = shard_host_batch(mesh, images, target)
        step_p = make_train_step(net, cfg_p, weight_decay=0.0, momentum=0.9,
                                 compute_dtype=None, donate=False)
        step_x = make_train_step(net, cfg_x, weight_decay=0.0, momentum=0.9,
                                 compute_dtype=None, donate=False)
        sp, stats_p = step_p(state, imgs, tgts, 1e-4, 100)
        sx, stats_x = step_x(state, imgs, tgts, 1e-4, 100)
    np.testing.assert_allclose(float(stats_p["loss"]),
                               float(stats_x["loss"]), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        sp.params, sx.params)


def test_build_targets_pallas_path_matches_xla():
    from singleshotpose_tpu.ops.targets import build_targets
    B, K, nA, H, W = 2, 9, 5, 13, 13
    rng = np.random.RandomState(2)
    pred = rng.uniform(0, 1, (B, nA * H * W, 2 * K)).astype(np.float32)
    t = np.zeros((B, 50 * 21), np.float32)
    tt = t.reshape(B, 50, 21)
    for b in range(B):
        for k in range(4):
            tt[b, k, 0] = k
            tt[b, k, 1:19] = rng.uniform(0.2, 0.8, 18)
            tt[b, k, 19:21] = [0.2, 0.25]
    anchors = (1.48, 2.24, 2.05, 3.13, 2.39, 4.69, 3.10, 3.99, 3.49, 5.89)
    kw = dict(num_keypoints=K, num_anchors=nA, nH=H, nW=W,
              noobject_scale=1.0, object_scale=5.0, sil_thresh=0.6,
              anchors=anchors)
    a = build_targets(jnp.asarray(pred), jnp.asarray(t), use_pallas=False, **kw)
    # interpret-mode pallas inside build_targets: monkeypatch the kernel flag
    import singleshotpose_tpu.ops.pallas_kernels as pk
    import functools
    orig = pk.max_corner_confidence
    pk_interp = functools.partial(orig, interpret=True)
    pk.max_corner_confidence = pk_interp
    try:
        b_ = build_targets(jnp.asarray(pred), jnp.asarray(t), use_pallas=True,
                           **kw)
    finally:
        pk.max_corner_confidence = orig
    for fa, fb in zip(a, b_):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   rtol=1e-5, atol=1e-6)
