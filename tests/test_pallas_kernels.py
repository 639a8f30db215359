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
