"""YUV 4:2:0 transfer path: device convert/resize numerics, native decode
round-trip vs the RGB path, and end-to-end eval equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

from singleshotpose_tpu.ops.yuv import yuv420_to_rgb_resized


def _np_reference(y, cbcr, out_w, out_h):
    """Same math in numpy: ×2 nearest chroma upsample, BT.601, center-sample
    nearest resize, /255."""
    B, H, W = y.shape
    yf = y.astype(np.float32)
    c = cbcr.astype(np.float32) - 128.0
    c = np.repeat(np.repeat(c, 2, axis=1), 2, axis=2)[:, :H, :W]
    cb, cr = c[..., 0], c[..., 1]
    r = yf + 1.402 * cr
    g = yf - 0.344136286 * cb - 0.714136286 * cr
    b = yf + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
    yi = np.minimum(((np.arange(out_h) + 0.5) * H / out_h).astype(int), H - 1)
    xi = np.minimum(((np.arange(out_w) + 0.5) * W / out_w).astype(int), W - 1)
    return rgb[:, yi][:, :, xi] / 255.0


def test_device_convert_matches_numpy():
    rng = np.random.RandomState(0)
    y = rng.randint(0, 255, (2, 48, 64), np.uint8)
    cbcr = rng.randint(0, 255, (2, 24, 32, 2), np.uint8)
    out = np.asarray(yuv420_to_rgb_resized(jnp.asarray(y), jnp.asarray(cbcr),
                                           out_w=80, out_h=72))
    ref = _np_reference(y, cbcr, 80, 72)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # identity shape path
    out2 = np.asarray(yuv420_to_rgb_resized(jnp.asarray(y), jnp.asarray(cbcr),
                                            out_w=64, out_h=48))
    np.testing.assert_allclose(out2, _np_reference(y, cbcr, 64, 48),
                               rtol=1e-5, atol=1e-5)


def test_native_yuv420_roundtrip_close_to_rgb(tmp_path):
    """native yuv420 decode + device convert ≈ native RGB decode (the chroma
    round-trip costs ≲2 u8 levels on photographic content)."""
    pytest.importorskip("PIL")
    from PIL import Image
    try:
        from singleshotpose_tpu.native import NativeLoader
        nl = NativeLoader(nthreads=1)
    except (RuntimeError, OSError, ImportError):
        pytest.skip("native loader unavailable")

    rng = np.random.RandomState(1)
    yy, xx = np.mgrid[0:64, 0:96]
    img = np.stack([(xx * 2 + 10) % 256, (yy * 3 + 40) % 256,
                    ((xx + yy) * 1.5) % 256], axis=-1).astype(np.uint8)
    img[20:40, 30:60] = rng.randint(0, 255, 3)
    p = str(tmp_path / "a.jpg")
    Image.fromarray(img).save(p, quality=95)

    rgb = nl.test_batch_u8([p], 96, 64).astype(np.float32) / 255.0
    y, cbcr = nl.test_batch_yuv420([p])
    assert y.shape == (1, 64, 96) and cbcr.shape == (1, 32, 48, 2)
    out = np.asarray(yuv420_to_rgb_resized(jnp.asarray(y), jnp.asarray(cbcr),
                                           out_w=96, out_h=64))
    diff = np.abs(out - rgb) * 255.0
    assert diff.mean() < 2.5, diff.mean()
    assert np.percentile(diff, 99) < 16, np.percentile(diff, 99)


def test_eval_transfer_yuv420_matches_rgb(tmp_path):
    """run_validation(transfer='yuv420') produces the same metric suite as
    the RGB path within tolerance on the synthetic set."""
    import jax
    from singleshotpose_tpu.drivers import run_validation
    from test_drivers import TINY_CFG, _make_synthetic_linemod

    datacfg, _ = _make_synthetic_linemod(tmp_path)
    cfgfile = tmp_path / "tiny.cfg"
    cfgfile.write_text(TINY_CFG)
    from singleshotpose_tpu.config import parse_cfg
    from singleshotpose_tpu.models.darknet import DarknetSpec
    spec = DarknetSpec(parse_cfg(str(cfgfile)))
    params, bstats = spec.init_params(jax.random.PRNGKey(0))

    kw = dict(params=params, batch_stats=bstats, batch_size=3,
              num_workers=0, compute_dtype=None, verbose=False)
    try:
        s_yuv = run_validation(datacfg, spec, transfer="yuv420", **kw)
    except (RuntimeError, OSError) as e:
        pytest.skip(f"native loader unavailable: {e}")
    s_rgb = run_validation(datacfg, spec, transfer="rgb", **kw)
    assert s_yuv["n_samples"] == s_rgb["n_samples"] == 6
    # random-net predictions: pixel-level input deltas shift errors slightly
    assert abs(s_yuv["mean_err_2d"] - s_rgb["mean_err_2d"]) \
        < 0.05 * max(s_rgb["mean_err_2d"], 1.0)
