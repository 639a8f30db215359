"""Scene-synthesis tests: compositing algebra + the full synthesizer on a
fake LINEMOD tree, plus a multi-object train step over synthesized scenes."""

import os

import numpy as np
import pytest

from singleshotpose_tpu.data import augment
from singleshotpose_tpu.data.pipeline import Loader, PoseDataset, AugmentConfig
from singleshotpose_tpu.data.synth_multi import (
    ADD_OBJS, MultiObjectSynthesizer, SynthConfig, mask_foreground,
    shifted_augment_with_mask, superimpose, superimpose_masks)


def test_add_objs_table():
    assert set(ADD_OBJS["ape"]) == {"can", "cat", "duck", "glue",
                                    "holepuncher", "iron", "phone"}
    for obj, companions in ADD_OBJS.items():
        assert obj not in companions


def test_mask_compositing_algebra():
    img = np.full((4, 4, 3), 100, np.uint8)
    mask = np.zeros((4, 4, 3), np.uint8)
    mask[:2] = 255
    fg = mask_foreground(img, mask)
    assert (fg[:2] == 100).all() and (fg[2:] == 0).all()

    canvas = np.full((4, 4, 3), 7, np.uint8)
    out = superimpose(fg, mask, canvas)
    assert (out[:2] == 100).all() and (out[2:] == 7).all()

    total = np.zeros((4, 4, 3), np.uint8)
    total[1:3] = 255
    acc = superimpose_masks(mask, total)
    assert (acc[:3] == 255).all() and (acc[3:] == 0).all()


def test_shifted_augment_wraps_and_labels_align():
    rng = np.random.RandomState(0)
    img = np.zeros((100, 100, 3), np.uint8)
    img[40:60, 40:60] = 255
    mask = img.copy()
    out, omask, flip, dx, dy, sx, sy = shifted_augment_with_mask(
        rng, img, mask, 100, 100, jitter=0.0, shift=30)
    # jitter 0 → pure wrap-shift; foreground preserved exactly
    assert out.sum() == img.sum()
    assert (out == omask).all()
    # label transform: centroid (0.5, 0.5) maps by x' = x/sx - dx
    cx = 0.5 / sx - dx
    ys_, xs_ = np.nonzero(out[..., 0])
    # wrap-around can split the blob; skip the check when it wrapped
    if xs_.max() - xs_.min() < 40 and ys_.max() - ys_.min() < 40:
        assert abs(cx * 100 - xs_.mean()) < 2.0


@pytest.fixture
def fake_linemod(tmp_path):
    """LINEMOD/<obj>/{JPEGImages,mask,labels,train.txt} for 3 objects."""
    from PIL import Image
    rng = np.random.RandomState(1)
    root = tmp_path / "LINEMOD"
    centers = {"ape": (160, 120), "can": (480, 120), "cat": (320, 360)}
    for oi, obj in enumerate(["ape", "can", "cat"]):
        base = root / obj
        for d in ("JPEGImages", "mask", "labels"):
            (base / d).mkdir(parents=True)
        paths = []
        for i in range(3):
            img = rng.randint(0, 255, (480, 640, 3), np.uint8)
            cx, cy = centers[obj]
            m = np.zeros((480, 640), np.uint8)
            m[cy - 60:cy + 60, cx - 60:cx + 60] = 255
            name = f"00{i:04d}"
            Image.fromarray(img).save(base / "JPEGImages" / f"{name}.jpg")
            Image.fromarray(m).save(base / "mask" / f"{name[2:]}.png")
            lab = np.zeros(21, np.float32)
            lab[0] = oi
            lab[1:19:2] = cx / 640.0 + rng.uniform(-0.05, 0.05, 9)
            lab[2:19:2] = cy / 480.0 + rng.uniform(-0.05, 0.05, 9)
            lab[19:21] = [0.19, 0.25]
            np.savetxt(base / "labels" / f"{name}.txt", lab[None])
            paths.append(f"LINEMOD/{obj}/JPEGImages/{name}.jpg")
        (base / "train.txt").write_text("\n".join(paths) + "\n")
    return str(root)


def test_synthesizer_builds_scene(fake_linemod, tmp_path):
    from PIL import Image
    rng = np.random.RandomState(2)
    bg = tmp_path / "bg.jpg"
    Image.fromarray(np.full((64, 64, 3), 30, np.uint8)).save(bg)

    # base = ape; restrict companions to the objects we faked
    import singleshotpose_tpu.data.synth_multi as sm
    orig = sm.ADD_OBJS
    sm.ADD_OBJS = dict(orig)
    sm.ADD_OBJS["ape"] = ("can", "cat")
    try:
        cfg = SynthConfig(linemod_root=fake_linemod, max_attempts=10)
        synth = MultiObjectSynthesizer(cfg)
        listfile = tmp_path / "train.txt"
        imgpath = os.path.join(fake_linemod, "ape/JPEGImages/000000.jpg")
        listfile.write_text(imgpath + "\n")
        ds = PoseDataset(str(listfile), train=True,
                         bg_file_names=[str(bg)], synthesizer=synth)
        img, label = ds.get_train(0, (416, 416), rng)
        assert img.shape == (416, 416, 3) and img.dtype == np.float32
        lab = label.reshape(50, 21)
        n = int((lab[:, 1] != 0).argmin())
        # base + 2 companions (objects were placed far apart)
        assert n == 3, lab[:4, :3]
        assert set(lab[:3, 0].astype(int)) == {0, 1, 2}
        # extents recomputed, nonzero
        assert (lab[:3, 19] > 0).all() and (lab[:3, 20] > 0).all()
    finally:
        sm.ADD_OBJS = orig


def test_multi_train_step_on_synth_scenes(fake_linemod, tmp_path):
    """Synthesized scenes feed a tiny 3-class 2-anchor net end-to-end."""
    import jax
    import jax.numpy as jnp
    from singleshotpose_tpu.models.darknet import DarknetSpec
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_blocks
    import singleshotpose_tpu.data.synth_multi as sm

    orig = sm.ADD_OBJS
    sm.ADD_OBJS = dict(orig)
    sm.ADD_OBJS["ape"] = ("can", "cat")
    try:
        blocks = yolo_pose_blocks(num_classes=3, num_anchors=2,
                                  anchors=(1.5, 2.2, 3.1, 4.0))
        small = [blocks[0], blocks[1]] + \
            [{"type": "maxpool", "size": "2", "stride": "2"}] * 5 + \
            [blocks[-2], blocks[-1]]
        net = DarknetSpec(small)
        assert net.out_filters[-2] == 2 * (18 + 1 + 3)

        # shift=80 is calibrated for 416-px scenes (image_multi.py:203);
        # scale it down for the 128-px test scene or centroids wrap off-screen
        synth = MultiObjectSynthesizer(
            SynthConfig(linemod_root=fake_linemod, max_attempts=10, shift=10))
        listfile = tmp_path / "tr.txt"
        listfile.write_text(os.path.join(
            fake_linemod, "ape/JPEGImages/000000.jpg") + "\n" + os.path.join(
            fake_linemod, "ape/JPEGImages/000001.jpg") + "\n")
        ds = PoseDataset(str(listfile), train=True, aug=AugmentConfig.multi(),
                         synthesizer=synth)
        ld = Loader(ds, batch_size=2, fixed_shape=(128, 128), num_workers=0,
                    seed=0)
        imgs, labels = next(iter(ld))

        params, bstats = net.init_params(jax.random.PRNGKey(0))
        state = init_train_state(params, bstats)
        cfg = RegionLossConfig.multi(anchors=(1.5, 2.2, 3.1, 4.0),
                                     num_classes=3, num_anchors=2)
        step = make_train_step(net, cfg, weight_decay=0.001, momentum=0.9,
                               compute_dtype=None, donate=False)
        state, stats = step(state, jnp.asarray(imgs), jnp.asarray(labels),
                            1e-4, 100)
        assert np.isfinite(float(stats["loss"]))
        assert float(stats["loss_cls"]) > 0      # CE class loss active
        assert int(stats["nGT"]) >= 2
    finally:
        sm.ADD_OBJS = orig
