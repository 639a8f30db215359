"""On-device augmentation parity vs the host numpy path, same parameters."""

import numpy as np
import pytest

import jax.numpy as jnp

from singleshotpose_tpu.data import augment
from singleshotpose_tpu.data.device_augment import (AugmentParams,
                                                    augment_batch,
                                                    draw_params)


def test_device_matches_host_pipeline():
    rng = np.random.RandomState(0)
    B, H, W = 3, 48, 64
    out_w = out_h = 32
    imgs = rng.randint(0, 256, (B, H, W, 3), np.uint8)
    masks = np.zeros((B, H, W), np.uint8)
    masks[:, 10:40, 20:50] = 255
    bgs = rng.randint(0, 256, (B, H, W, 3), np.uint8)

    params, lab = draw_params(rng, B, W, H, jitter=0.2, hue=0.1,
                              saturation=1.5, exposure=1.5)

    dev = np.asarray(augment_batch(
        jnp.asarray(imgs, jnp.float32) / 255.0,
        jnp.asarray(masks, jnp.float32)[..., None] / 255.0,
        jnp.asarray(bgs, jnp.float32) / 255.0,
        params, out_w, out_h))

    for b in range(B):
        comp = augment.change_background(imgs[b], masks[b], bgs[b])
        crop = augment.crop_resize(
            comp, int(params.pleft[b]), int(params.ptop[b]),
            int(params.swidth[b]), int(params.sheight[b]), out_w, out_h)
        host = augment.distort_hsv(crop, float(params.dhue[b]),
                                   float(params.dsat[b]),
                                   float(params.dexp[b])).astype(np.float32) / 255.0
        diff = np.abs(dev[b] - host)
        assert diff.mean() < 0.02, (b, diff.mean())
        assert (diff < 0.12).mean() > 0.97, (b,)


def test_label_transform_matches_host_draws():
    """draw_params' label transform equals the host path's dx/dy/sx/sy."""
    seed = 7
    B, H, W = 4, 48, 64
    r1 = np.random.RandomState(seed)
    params, lab = draw_params(r1, B, W, H, jitter=0.2, hue=0.1,
                              saturation=1.5, exposure=1.5)

    r2 = np.random.RandomState(seed)
    img = np.zeros((H, W, 3), np.uint8)
    for b in range(B):
        _, _flip, dx, dy, sx, sy = augment.data_augmentation(
            r2, img, 32, 32, 0.2, 0.1, 1.5, 1.5)
        np.testing.assert_allclose(lab[b], [dx, dy, sx, sy], rtol=1e-6)


def test_zero_jitter_identity_crop():
    rng = np.random.RandomState(1)
    B, H, W = 2, 32, 32
    imgs = rng.randint(0, 256, (B, H, W, 3), np.uint8)
    params = AugmentParams(
        pleft=jnp.zeros(B), ptop=jnp.zeros(B),
        swidth=jnp.full(B, float(W)), sheight=jnp.full(B, float(H)),
        dhue=jnp.zeros(B), dsat=jnp.ones(B), dexp=jnp.ones(B))
    out = np.asarray(augment_batch(
        jnp.asarray(imgs, jnp.float32) / 255.0,
        jnp.ones((B, H, W, 1), jnp.float32),
        jnp.zeros((B, H, W, 3), jnp.float32), params, W, H))
    # identity geometry; HSV round-trip quantization only
    assert np.abs(out - imgs.astype(np.float32) / 255.0).mean() < 0.02
