"""HBM frame-bank single-object augmentation (data/device_bank.py).

The load-bearing claim: the ``device_bank`` backend is BIT-IDENTICAL to the
``device`` backend (which itself is parity-by-metric with the reference's
PIL path) — the crop-resize selection commutes with the background
composite, so gathering from the bank and compositing at output size equals
compositing at native size and cropping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from singleshotpose_tpu.data import augment
from singleshotpose_tpu.data.device_augment import draw_params
from singleshotpose_tpu.data.device_bank import (augment_bank_batch,
                                                 build_frame_bank)
from singleshotpose_tpu.data.pipeline import (SINGLE_SCHEDULE, Loader,
                                              PoseDataset)

from test_data_pipeline import tiny_linemod  # noqa: F401  (fixture)


def _loader(lst, bgs, backend, seed=3, batch=2):
    ds = PoseDataset(lst, train=True, bg_file_names=bgs)
    return Loader(ds, batch_size=batch, schedule=SINGLE_SCHEDULE,
                  num_workers=0, seed=seed, backend=backend)


def test_bank_matches_device_backend_bitexact(tiny_linemod):  # noqa: F811
    """Same seed → same rng stream → bit-identical images, ~equal labels."""
    lst, bgs = tiny_linemod
    dev = list(_loader(lst, bgs, "device"))
    bank = list(_loader(lst, bgs, "device_bank"))
    assert len(dev) == len(bank) == 2
    for (di, dl), (bi, bl) in zip(dev, bank):
        np.testing.assert_array_equal(np.asarray(di), np.asarray(bi))
        # labels: the bank transform runs on device in f32; the host path
        # computes reciprocal scales in f64 before rounding
        np.testing.assert_allclose(np.asarray(bl), np.asarray(dl), atol=2e-6)


def test_bank_no_backgrounds_matches_device(tiny_linemod):  # noqa: F811
    """No bg list → no compositing on either backend (full masks)."""
    lst, _ = tiny_linemod
    dev = list(_loader(lst, [], "device"))
    bank = list(_loader(lst, [], "device_bank"))
    for (di, _), (bi, _) in zip(dev, bank):
        np.testing.assert_array_equal(np.asarray(di), np.asarray(bi))


def test_label_transform_matches_host(tiny_linemod):  # noqa: F811
    """Device row transform ≡ augment.transform_truths per sample."""
    lst, bgs = tiny_linemod
    ds = PoseDataset(lst, train=True, bg_file_names=bgs)
    bank = build_frame_bank(ds).device_put()
    rng = np.random.RandomState(11)
    B = len(ds.lines)
    H, W = bank.frame_shape
    params, lab_tf = draw_params(rng, B, W, H, jitter=0.2, hue=0.1,
                                 saturation=1.5, exposure=1.5)
    idxs = np.arange(B, dtype=np.int32)
    _, labels = augment_bank_batch(bank, jnp.asarray(idxs),
                                   jnp.zeros(B, jnp.int32), params,
                                   out_w=32, out_h=32, K=9)
    labels = np.asarray(labels)
    for b in range(B):
        host = augment.transform_truths(
            ds._read_truths_full(ds.lines[b]), lab_tf[b, 0], lab_tf[b, 1],
            1.0 / lab_tf[b, 2], 1.0 / lab_tf[b, 3], 9, ds.max_num_gt)
        np.testing.assert_allclose(labels[b], host, atol=2e-6)


def test_empty_label_rows_stay_zero(tiny_linemod):  # noqa: F811
    lst, bgs = tiny_linemod
    ds = PoseDataset(lst, train=True, bg_file_names=bgs)
    bank = build_frame_bank(ds).device_put()
    rng = np.random.RandomState(0)
    H, W = bank.frame_shape
    params, _ = draw_params(rng, 1, W, H, jitter=0.2, hue=0.1,
                            saturation=1.5, exposure=1.5)
    _, labels = augment_bank_batch(bank, jnp.zeros(1, jnp.int32),
                                   jnp.zeros(1, jnp.int32), params,
                                   out_w=32, out_h=32, K=9)
    rows = np.asarray(labels).reshape(50, 21)
    assert (rows[1:] == 0).all()      # one GT per tiny_linemod frame
    assert rows[0, 1] != 0


def test_bank_sharded_matches_single_device(tiny_linemod):  # noqa: F811
    """device_bank under a ("data","model") mesh ≡ unsharded (same seed)."""
    from singleshotpose_tpu.parallel.sharding import make_mesh

    lst, bgs = tiny_linemod
    single = list(_loader(lst, bgs, "device_bank", batch=4))

    mesh = make_mesh(jax.devices()[:8], mp=2)
    ds = PoseDataset(lst, train=True, bg_file_names=bgs)
    ld = Loader(ds, batch_size=4, schedule=SINGLE_SCHEDULE, num_workers=0,
                seed=3, backend="device_bank", mesh=mesh)
    sharded = list(ld)
    assert len(single) == len(sharded) == 1
    np.testing.assert_array_equal(np.asarray(single[0][0]),
                                  np.asarray(sharded[0][0]))
    # labels are f32 affine transforms — GSPMD partitioning may fuse the
    # multiply-adds differently (1-ulp FMA contraction), same as vs host
    np.testing.assert_allclose(np.asarray(single[0][1]),
                               np.asarray(sharded[0][1]), atol=2e-6)


def test_run_training_device_bank_smoke(tmp_path):
    """One epoch of the single trainer end-to-end on the bank backend."""
    from test_drivers import TINY_CFG, _make_synthetic_linemod

    from singleshotpose_tpu.drivers import TrainRunConfig, run_training

    datacfg, _backup = _make_synthetic_linemod(tmp_path)
    cfgfile = tmp_path / "tiny.cfg"
    cfgfile.write_text(TINY_CFG)
    rc = TrainRunConfig(loader_backend="device_bank", num_workers=0,
                        eval_every=100, eval_after=100, log_every=2,
                        max_epochs_override=1, bg_dir="/nonexistent")
    rc.compute_dtype = None
    # bg_dir has no images → trains composite-free; exercises the wiring
    result = run_training(datacfg, str(cfgfile), None, 100, rc)
    losses = result["history"]["training_losses"]
    assert len(losses) == 3 and np.isfinite(losses).all()


def test_device_put_hbm_budget_preflight(monkeypatch):
    """An over-budget bank placement must fail with the actionable message,
    not an opaque device OOM (utils/memory.check_hbm_budget)."""
    import numpy as np
    import pytest
    from singleshotpose_tpu.data.device_bank import DeviceFrameBank
    from singleshotpose_tpu.utils import memory as M

    bank = DeviceFrameBank(
        images=np.zeros((2, 4, 4, 3), np.uint8),
        masks=np.zeros((2, 4, 4), np.uint8),
        truths=np.zeros((2, 50, 21), np.float32),
        n_rows=np.ones(2, np.int32),
        bgs=np.zeros((1, 4, 4, 3), np.uint8))
    monkeypatch.setattr(M, "hbm_free_bytes", lambda: 1 << 20)  # 1 MB free
    with pytest.raises(RuntimeError, match="device memory"):
        bank.device_put()
    # plenty free -> places fine
    monkeypatch.setattr(M, "hbm_free_bytes", lambda: 64 << 30)
    bank.device_put()
    # no accounting (CPU) -> no-op guard
    monkeypatch.setattr(M, "hbm_free_bytes", lambda: None)
    bank.device_put()
