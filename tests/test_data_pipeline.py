"""Data pipeline tests: augmentation semantics vs PIL/reference algebra,
multi-scale schedule brackets, loader batching."""

import os

import numpy as np
import pytest

from singleshotpose_tpu.data import augment
from singleshotpose_tpu.data.pipeline import (
    MULTI_SCHEDULE, SINGLE_SCHEDULE, AugmentConfig, Loader, PoseDataset)


def test_hsv_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)
    out = augment.hsv_to_rgb_u8(augment.rgb_to_hsv_u8(img))
    # uint8 quantization of H/S loses a little; stays within a few levels
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4


def test_distort_identity_is_noop_within_quantization():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (8, 8, 3), np.uint8)
    out = augment.distort_hsv(img, 0.0, 1.0, 1.0)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_distort_vs_pil():
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (32, 32, 3), np.uint8)
    for dhue, dsat, dexp in [(0.05, 1.2, 0.8), (-0.1, 0.7, 1.5)]:
        ours = augment.distort_hsv(img, dhue, dsat, dexp).astype(np.float32)

        im = Image.fromarray(img).convert("HSV")
        cs = list(im.split())
        cs[1] = cs[1].point(lambda i: i * dsat)
        cs[2] = cs[2].point(lambda i: i * dexp)

        def change_hue(x):
            x += dhue * 255
            if x > 255:
                x -= 255
            if x < 0:
                x += 255
            return x
        cs[0] = cs[0].point(change_hue)
        ref = np.asarray(Image.merge("HSV", tuple(cs)).convert("RGB"),
                         dtype=np.float32)
        # different rounding paths; require close agreement on average
        assert np.abs(ours - ref).mean() < 6.0, (dhue, dsat, dexp)


def test_change_background_binary_mask():
    img = np.full((4, 4, 3), 200, np.uint8)
    bg = np.full((8, 8, 3), 10, np.uint8)
    mask = np.zeros((4, 4, 3), np.uint8)
    mask[:2] = 255
    out = augment.change_background(img, mask, bg)
    assert (out[:2] == 200).all() and (out[2:] == 10).all()


def test_crop_resize_identity():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (20, 30, 3), np.uint8)
    out = augment.crop_resize(img, 0, 0, 30, 20, 30, 20)
    np.testing.assert_array_equal(out, img)


def test_crop_resize_zero_pad():
    img = np.full((10, 10, 3), 255, np.uint8)
    out = augment.crop_resize(img, -5, -5, 20, 20, 20, 20)
    assert (out[:5, :, :] == 0).all() and (out[:, :5, :] == 0).all()
    assert (out[5:15, 5:15] == 255).all()


def test_transform_truths_matches_reference_loop():
    """Vectorized label transform ≡ fill_truth_detection's per-row loop."""
    rng = np.random.RandomState(4)
    K, nl = 9, 21
    n = 3
    bs = rng.uniform(0.1, 0.9, (n, nl)).astype(np.float32)
    bs[:, 0] = [0, 3, 7]
    dx, dy, sx, sy = 0.1, -0.05, 1.25, 0.8

    ours = augment.transform_truths(bs.copy().reshape(-1), dx, dy, sx, sy, K)

    ref = np.zeros((50, nl), np.float32)
    for i in range(n):
        row = bs[i].copy()
        xs = [row[2 * j + 1] for j in range(K)]
        ys = [row[2 * j + 2] for j in range(K)]
        xs[0] = min(0.999, max(0, xs[0] * sx - dx))
        ys[0] = min(0.999, max(0, ys[0] * sy - dy))
        for j in range(1, K):
            xs[j] = xs[j] * sx - dx
            ys[j] = ys[j] * sy - dy
        for j in range(K):
            row[2 * j + 1] = xs[j]
            row[2 * j + 2] = ys[j]
        ref[i] = row
    np.testing.assert_allclose(ours, ref.reshape(-1), rtol=1e-6, atol=1e-6)


def test_schedule_brackets():
    rng = np.random.RandomState(5)
    nb, bsz = 100, 8
    # stage 0: fixed 416
    ws = {SINGLE_SCHEDULE.draw(rng, 0, nb, bsz) for _ in range(20)}
    assert ws == {416}
    # stage 1: 416..640
    ws = {SINGLE_SCHEDULE.draw(rng, 15 * nb * bsz, nb, bsz) for _ in range(200)}
    assert min(ws) >= 416 and max(ws) <= 640 and len(ws) > 3
    # final stage: 224..832
    ws = {SINGLE_SCHEDULE.draw(rng, 99 * nb * bsz, nb, bsz) for _ in range(500)}
    assert min(ws) >= 224 and max(ws) <= 832
    assert set(SINGLE_SCHEDULE.all_widths) == set(range(224, 833, 32))
    assert set(MULTI_SCHEDULE.all_widths) == set(range(320, 609, 32))


@pytest.fixture
def tiny_linemod(tmp_path):
    """Synthetic LINEMOD-format mini dataset: JPEGImages/, mask/, labels/."""
    from PIL import Image
    root = tmp_path / "obj"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "mask").mkdir()
    (root / "labels").mkdir()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        img = rng.randint(0, 256, (48, 64, 3), np.uint8)
        name = f"{i:06d}"
        p = root / "JPEGImages" / f"{name}.jpg"
        Image.fromarray(img).save(p)
        m = np.zeros((48, 64), np.uint8)
        m[10:30, 20:40] = 255
        # mask path rule: JPEGImages→mask, /00→/, .jpg→.png (image.py:131)
        Image.fromarray(m).save(root / "mask" / f"{name[2:]}.png")
        lab = np.zeros(21, np.float32)
        lab[1:19] = rng.uniform(0.3, 0.7, 18)
        lab[19:21] = [0.3, 0.4]
        np.savetxt(root / "labels" / f"{name}.txt", lab[None])
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")
    bg = tmp_path / "bg.jpg"
    Image.fromarray(rng.randint(0, 256, (32, 32, 3), np.uint8)).save(bg)
    return str(lst), [str(bg)]


def test_loader_train_batches(tiny_linemod):
    lst, bgs = tiny_linemod
    ds = PoseDataset(lst, train=True, bg_file_names=bgs)
    ld = Loader(ds, batch_size=2, schedule=SINGLE_SCHEDULE, num_workers=2,
                seed=0)
    batches = list(ld)
    assert len(batches) == 2
    for imgs, labels in batches:
        assert imgs.shape == (2, 416, 416, 3)      # stage-0 width
        assert labels.shape == (2, 50 * 21)
        assert imgs.dtype == np.float32 and imgs.max() <= 1.0
        assert (labels[:, 1:19] != 0).all()        # slot-0 GT present
    assert ld.seen == 4


def test_loader_test_batches(tiny_linemod):
    lst, _ = tiny_linemod
    ds = PoseDataset(lst, train=False)
    ld = Loader(ds, batch_size=1, fixed_shape=(672, 672), shuffle=False,
                num_workers=0, drop_last=False)
    imgs, labels = next(iter(ld))
    assert imgs.shape == (1, 672, 672, 3)
    assert labels.shape == (1, 50 * 21)
    assert labels[0, 1] != 0


def test_loader_train_uint8_bit_exact(tiny_linemod):
    """u8 train batches normalize to exactly the f32 loader's values (the
    augmentation pipeline is uint8 throughout; /255 commutes), for both the
    python and native backends."""
    lst, bgs = tiny_linemod
    for backend in ("python", "auto"):
        ds = PoseDataset(lst, train=True, bg_file_names=bgs)
        f32 = list(Loader(ds, batch_size=2, schedule=SINGLE_SCHEDULE,
                          num_workers=0, seed=7, backend=backend))
        ds2 = PoseDataset(lst, train=True, bg_file_names=bgs)
        u8 = list(Loader(ds2, batch_size=2, schedule=SINGLE_SCHEDULE,
                         num_workers=0, seed=7, backend=backend,
                         out_uint8=True))
        assert len(f32) == len(u8) == 2
        for (fi, fl), (ui, ul) in zip(f32, u8):
            assert ui.dtype == np.uint8
            np.testing.assert_array_equal(ui.astype(np.float32) / 255.0, fi)
            np.testing.assert_array_equal(ul, fl)
