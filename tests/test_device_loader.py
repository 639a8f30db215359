"""Loader device backend: decode on host, augment on accelerator; plus the
pretrain-head transfer flow (yolo-pose-pre → yolo-pose-multi)."""

import numpy as np
import pytest

import jax

from singleshotpose_tpu.data.pipeline import Loader, PoseDataset


@pytest.fixture
def tiny_ds(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(0)
    root = tmp_path / "obj"
    for d in ("JPEGImages", "mask", "labels"):
        (root / d).mkdir(parents=True)
    paths = []
    for i in range(4):
        img = rng.randint(0, 256, (48, 64, 3), np.uint8)
        name = f"{i:06d}"
        p = root / "JPEGImages" / f"{name}.png"
        Image.fromarray(img).save(p)
        m = np.zeros((48, 64), np.uint8)
        m[10:30, 20:40] = 255
        Image.fromarray(m).save(root / "mask" / f"{name[2:]}.png")
        lab = np.zeros(21, np.float32)
        lab[1:19] = rng.uniform(0.3, 0.7, 18)
        lab[19:21] = [0.3, 0.4]
        np.savetxt(root / "labels" / f"{name}.txt", lab[None])
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")
    bg = tmp_path / "bg.png"
    Image.fromarray(rng.randint(0, 256, (24, 24, 3), np.uint8)).save(bg)
    return str(lst), [str(bg)]


def test_device_backend_batches(tiny_ds):
    lst, bgs = tiny_ds
    ds = PoseDataset(lst, train=True, bg_file_names=bgs)
    ld = Loader(ds, batch_size=4, fixed_shape=(96, 96), num_workers=2,
                seed=3, backend="device")
    imgs, labels = next(iter(ld))
    assert isinstance(imgs, jax.Array)
    assert imgs.shape == (4, 96, 96, 3)
    assert labels.shape == (4, 50 * 21)
    assert (labels.reshape(4, 50, 21)[:, 0, 1] != 0).all()
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all() and 0 <= arr.min() and arr.max() <= 1.0
    assert ld.seen == 4


def test_device_backend_feeds_train_step(tiny_ds):
    import jax.numpy as jnp
    from singleshotpose_tpu.config import parse_cfg
    from singleshotpose_tpu.models.darknet import DarknetSpec
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from test_training import TINY_CFG

    lst, bgs = tiny_ds
    ds = PoseDataset(lst, train=True, bg_file_names=bgs)
    ld = Loader(ds, batch_size=4, fixed_shape=(64, 64), num_workers=0,
                seed=1, backend="device")
    imgs, labels = next(iter(ld))

    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".cfg") as f:
        f.write(TINY_CFG)
        f.flush()
        net = DarknetSpec(parse_cfg(f.name))
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    state = init_train_state(params, bstats)
    step = make_train_step(net, RegionLossConfig.single(),
                           weight_decay=0.002, momentum=0.9,
                           compute_dtype=None, donate=False)
    state, stats = step(state, imgs, jnp.asarray(labels), 1e-4, 100)
    assert np.isfinite(float(stats["loss"]))
    assert int(stats["nGT"]) >= 1


def test_pretrain_head_transfer():
    """yolo-pose-pre checkpoint (32ch head) loads under the multi net's
    differently-shaped 160ch head via load_weights_until_last — the
    reference's 2-stage multi workflow (README.md:114-122)."""
    import tempfile

    from singleshotpose_tpu import weights as W
    from singleshotpose_tpu.zoo import yolo_pose_multi, yolo_pose_pretrain

    pre = yolo_pose_pretrain()
    multi = yolo_pose_multi()
    params, bstats = pre.init_params(jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/pre.weights"
        W.save_weights(pre, params, bstats, path, seen=42)
        header, mp, mst = W.load_weights_until_last(multi, path)
        # backbone identical
        np.testing.assert_array_equal(np.asarray(mp["conv_1"]["w"]),
                                      np.asarray(params["conv_1"]["w"]))
        np.testing.assert_array_equal(np.asarray(mp["conv_22"]["w"]),
                                      np.asarray(params["conv_22"]["w"]))
        # head fresh-initialized at the multi shape
        assert mp["conv_23"]["w"].shape[-1] == 160
        assert header.seen == 42


def test_cache_decoded_hits_once(tiny_ds, monkeypatch):
    """With cache_decoded, each image/mask file is decoded exactly once
    across epochs."""
    import singleshotpose_tpu.data.pipeline as pl
    lst, bgs = tiny_ds
    calls = []
    real = pl.load_image

    def counting(path):
        calls.append(path)
        return real(path)

    monkeypatch.setattr(pl, "load_image", counting)
    ds = PoseDataset(lst, train=True, bg_file_names=bgs, cache_decoded=True)
    ld = Loader(ds, batch_size=4, fixed_shape=(64, 64), num_workers=0,
                seed=0, backend="python")
    for _ in range(3):             # 3 epochs
        for _ in ld:
            pass
    img_mask_calls = [c for c in calls if "bg" not in c]
    assert len(set(img_mask_calls)) == 8          # 4 imgs + 4 masks
    assert len(img_mask_calls) == 8               # each decoded once
