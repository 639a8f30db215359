"""On-device scene synthesis tests (data/device_synth.py).

Two layers: exact-geometry checks on a hand-crafted bank (jitter/shift 0 →
the resample is the identity, so compositing/rejection/labels have closed
forms), and the full bank-from-LINEMOD-tree path feeding a train step."""

import os

import numpy as np
import pytest

import jax

from singleshotpose_tpu.data.device_synth import (
    DeviceSceneBank, DeviceSynthStatic, build_scene_bank, synthesize_batch)
from singleshotpose_tpu.data.synth_multi import SynthConfig

NL = 21
K = 9


def _label_row(cls, cx, cy, half):
    """One 21-float row with keypoints on the mask's bounding box."""
    row = np.zeros(NL, np.float32)
    row[0] = cls
    xs = np.clip(cx + half * np.array([0, -1, 1, -1, 1, -1, 1, 0, 0]), 0, 1)
    ys = np.clip(cy + half * np.array([0, -1, -1, 1, 1, 0, 0, -1, 1]), 0, 1)
    row[1:2 * K + 1:2] = xs
    row[2:2 * K + 1:2] = ys
    row[19] = xs.max() - xs.min()
    row[20] = ys.max() - ys.min()
    return row


@pytest.fixture
def hand_bank():
    """3 frames, 32×32: base (cls 0, cols 0..11), an overlapping companion
    (cls 1, cols 0..11) and a disjoint one (cls 2, cols 20..31)."""
    H = W = 32
    imgs = np.zeros((3, H, W, 3), np.uint8)
    masks = np.zeros((3, H, W), np.uint8)
    for i, (val, c0, c1) in enumerate(((200, 0, 12), (50, 0, 12),
                                       (100, 20, 32))):
        imgs[i, :, c0:c1] = val
        masks[i, :, c0:c1] = 255
    labels = np.stack([
        _label_row(0, 6 / 32, 0.5, 4 / 32),
        _label_row(1, 6 / 32, 0.5, 4 / 32),
        _label_row(2, 26 / 32, 0.5, 4 / 32)])
    obj_start = np.zeros(13, np.int32)
    obj_count = np.zeros(13, np.int32)
    obj_start[1], obj_count[1] = 1, 1
    obj_start[2], obj_count[2] = 2, 1
    comp = np.full((13, 8), -1, np.int32)
    comp[0, 0], comp[0, 1] = 1, 2
    bgs = np.full((1, H, W, 3), 30, np.uint8)
    return DeviceSceneBank(imgs, masks, labels, obj_start, obj_count, comp,
                           bgs, np.array([0], np.int32),
                           np.array([0], np.int32))


def test_rejection_composite_and_labels_exact(hand_bank):
    st = DeviceSynthStatic(jitter=0.0, shift=0, attempts=3)
    imgs, labels = synthesize_batch(hand_bank, np.array([0], np.int32),
                                    jax.random.PRNGKey(3), out_w=32,
                                    out_h=32, st=st)
    img = np.asarray(imgs)[0]
    lab = np.asarray(labels).reshape(1, 50, NL)[0]

    # cls 1 fully overlaps the base (ratio 1.0 ≥ 0.2 → rejected);
    # cls 2 is disjoint (ratio 0.0 → accepted)
    n = int((lab[:, 1] != 0).argmin())
    assert n == 2
    assert set(lab[:2, 0].astype(int)) == {0, 2}

    # identity transform → label rows equal the bank rows (modulo order)
    np.testing.assert_allclose(lab[0], hand_bank.labels[0], atol=1e-6)
    np.testing.assert_allclose(lab[1], hand_bank.labels[2], atol=1e-6)

    # exact compositing: base on cols 0..11, companion 2 on 20..31,
    # background between, base on top everywhere its mask is set
    np.testing.assert_allclose(img[:, 0:12], 200 / 255.0, atol=1e-6)
    np.testing.assert_allclose(img[:, 20:32], 100 / 255.0, atol=1e-6)
    np.testing.assert_allclose(img[:, 12:20], 30 / 255.0, atol=1e-6)


def test_base_always_on_top(hand_bank):
    """Move companion 2 onto the base: whatever the rejection outcome, the
    base pixels must win where its mask is set (re-pasted last)."""
    masks = np.array(hand_bank.masks)
    imgs = np.array(hand_bank.images)
    masks[2] = 0
    masks[2, :, 6:18] = 255          # overlaps base cols 6..11 (ratio 0.5)
    imgs[2] = 0
    imgs[2, :, 6:18] = 100
    bank = hand_bank._replace(masks=masks, images=imgs)
    st = DeviceSynthStatic(jitter=0.0, shift=0, attempts=3,
                           max_intersection=0.75)   # force acceptance
    out, labels = synthesize_batch(bank, np.array([0], np.int32),
                                   jax.random.PRNGKey(0), out_w=32, out_h=32,
                                   st=st)
    img = np.asarray(out)[0]
    lab = np.asarray(labels).reshape(50, NL)
    assert int((lab[:, 1] != 0).argmin()) == 2       # accepted at 0.5 < 0.75
    np.testing.assert_allclose(img[:, 0:12], 200 / 255.0, atol=1e-6)
    np.testing.assert_allclose(img[:, 12:18], 100 / 255.0, atol=1e-6)


def test_base_class_indexed_by_dataset_line(hand_bank):
    """``base_index`` and ``base_class`` are DATASET-LINE-indexed; the
    companion row must come from the line's class, not the bank row's.

    Dataset line 0 → bank row 2 (class 2, NO companions).  A bank-row
    lookup would clamp into ``base_class[0]`` = class 0 and paste class
    0's companions — the scene must stay base-only instead."""
    bank = hand_bank._replace(base_index=np.array([2], np.int32),
                              base_class=np.array([2], np.int32))
    st = DeviceSynthStatic(jitter=0.0, shift=0, attempts=3)
    imgs, labels = synthesize_batch(bank, np.array([0], np.int32),
                                    jax.random.PRNGKey(2), out_w=32,
                                    out_h=32, st=st)
    img = np.asarray(imgs)[0]
    lab = np.asarray(labels).reshape(50, NL)
    assert int((lab[:, 1] != 0).argmin()) == 1       # base only, no pastes
    assert int(lab[0, 0]) == 2
    np.testing.assert_allclose(img[:, 20:32], 100 / 255.0, atol=1e-6)
    np.testing.assert_allclose(img[:, 0:20], 30 / 255.0, atol=1e-6)


def test_unplaceable_when_all_proposals_collide(hand_bank):
    """Only the fully-overlapping companion available → scene stays base-only
    (the host path's attempt-capped drop, synth_multi.py:283)."""
    comp = np.array(hand_bank.companions)
    comp[0] = -1
    comp[0, 0] = 1
    bank = hand_bank._replace(companions=comp)
    st = DeviceSynthStatic(jitter=0.0, shift=0, attempts=4)
    _, labels = synthesize_batch(bank, np.array([0], np.int32),
                                 jax.random.PRNGKey(1), out_w=32, out_h=32,
                                 st=st)
    lab = np.asarray(labels).reshape(50, NL)
    assert int((lab[:, 1] != 0).argmin()) == 1


@pytest.fixture
def fake_linemod(tmp_path):
    """LINEMOD/<obj>/{JPEGImages,mask,labels,train.txt} for 3 objects
    (same tree as tests/test_synth_multi.py)."""
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


@pytest.fixture
def small_companions():
    import singleshotpose_tpu.data.synth_multi as sm
    orig = sm.ADD_OBJS
    sm.ADD_OBJS = dict(orig)
    sm.ADD_OBJS["ape"] = ("can", "cat")
    yield
    sm.ADD_OBJS = orig


def test_bank_from_linemod_tree(fake_linemod, small_companions, tmp_path):
    from PIL import Image
    bgp = tmp_path / "bg.jpg"
    Image.fromarray(np.full((64, 64, 3), 30, np.uint8)).save(bgp)
    cfg = SynthConfig(linemod_root=fake_linemod, shift=10)
    bases = [os.path.join(fake_linemod, "ape/JPEGImages/000000.jpg"),
             os.path.join(fake_linemod, "ape/JPEGImages/000001.jpg")]
    bank = build_scene_bank(cfg, bases, [str(bgp)]).device_put()

    assert bank.images.shape == (9, 480, 640, 3)     # 3 objects × 3 frames
    assert bank.bgs.shape == (1, 480, 640, 3)        # pre-resized to frame
    counts = np.asarray(bank.obj_count)
    assert counts[[0, 3, 4]].tolist() == [3, 3, 3]   # ape/can/cat classes
    assert counts.sum() == 9
    assert np.asarray(bank.base_class).tolist() == [0, 0]
    # 13 class rows + the all-−1 sentinel for out-of-class base frames
    assert bank.companions.shape == (14, 8)

    st = DeviceSynthStatic.from_config(cfg)
    imgs, labels = synthesize_batch(bank, np.arange(2, dtype=np.int32),
                                    jax.random.PRNGKey(0), out_w=128,
                                    out_h=128, st=st)
    imgs = np.asarray(imgs)
    lab = np.asarray(labels).reshape(2, 50, NL)
    assert imgs.shape == (2, 128, 128, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    for b in range(2):
        n = int((lab[b, :, 1] != 0).argmin())
        # centers far apart → both companions place; class ids come from
        # the label files (0/1/2 in the fixture)
        assert n == 3
        assert lab[b, 0, 0] == 0
        assert set(lab[b, :n, 0].astype(int)) == {0, 1, 2}
        assert (lab[b, :n, 19:21] > 0).all()

    # determinism: same key → identical batch
    i2, l2 = synthesize_batch(bank, np.arange(2, dtype=np.int32),
                              jax.random.PRNGKey(0), out_w=128, out_h=128,
                              st=st)
    np.testing.assert_array_equal(imgs, np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(l2))


def test_loader_device_synth_feeds_train_step(fake_linemod, small_companions,
                                              tmp_path):
    """backend="device_synth" through the Loader → fused multi train step."""
    import jax.numpy as jnp
    from singleshotpose_tpu.data.pipeline import (AugmentConfig, Loader,
                                                  PoseDataset)
    from singleshotpose_tpu.data.synth_multi import MultiObjectSynthesizer
    from singleshotpose_tpu.models.darknet import DarknetSpec
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_blocks

    synth = MultiObjectSynthesizer(
        SynthConfig(linemod_root=fake_linemod, shift=10))
    listfile = tmp_path / "tr.txt"
    listfile.write_text(os.path.join(
        fake_linemod, "ape/JPEGImages/000000.jpg") + "\n" + os.path.join(
        fake_linemod, "ape/JPEGImages/000001.jpg") + "\n")
    ds = PoseDataset(str(listfile), train=True, aug=AugmentConfig.multi(),
                     synthesizer=synth)
    ld = Loader(ds, batch_size=2, fixed_shape=(128, 128), num_workers=0,
                seed=0, backend="device_synth")
    imgs, labels = next(iter(ld))
    assert isinstance(imgs, jax.Array) and isinstance(labels, jax.Array)
    assert imgs.shape == (2, 128, 128, 3)
    assert ld.seen == 2

    blocks = yolo_pose_blocks(num_classes=3, num_anchors=2,
                              anchors=(1.5, 2.2, 3.1, 4.0))
    small = [blocks[0], blocks[1]] + \
        [{"type": "maxpool", "size": "2", "stride": "2"}] * 5 + \
        [blocks[-2], blocks[-1]]
    net = DarknetSpec(small)
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    state = init_train_state(params, bstats)
    cfg = RegionLossConfig.multi(anchors=(1.5, 2.2, 3.1, 4.0),
                                 num_classes=3, num_anchors=2)
    step = make_train_step(net, cfg, weight_decay=0.001, momentum=0.9,
                           compute_dtype=None, donate=False)
    state, stats = step(state, imgs, labels, 1e-4, 100)
    assert np.isfinite(float(stats["loss"]))
    assert int(stats["nGT"]) >= 2


def test_synth_under_mesh_matches_unsharded(hand_bank):
    """Batch indices sharded over the data axis: GSPMD partitions the scene
    synthesis across chips; values must match the single-device run."""
    from singleshotpose_tpu.parallel.sharding import (batch_sharding,
                                                      make_mesh, replicated)
    st = DeviceSynthStatic(jitter=0.0, shift=0, attempts=2)
    idxs = np.zeros(8, np.int32)
    key = jax.random.PRNGKey(5)
    ref_imgs, ref_labs = synthesize_batch(hand_bank, idxs, key, out_w=32,
                                          out_h=32, st=st)

    mesh = make_mesh(jax.devices()[:8], dp=4, mp=2)
    bank = hand_bank.device_put(replicated(mesh))
    sidx = jax.device_put(idxs, batch_sharding(mesh, 1))
    imgs, labs = synthesize_batch(bank, sidx, key, out_w=32, out_h=32, st=st)
    assert len(imgs.sharding.device_set) == 8 or \
        imgs.sharding.is_fully_replicated is False
    np.testing.assert_array_equal(np.asarray(ref_imgs), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(ref_labs), np.asarray(labs))


def test_loader_device_synth_requires_synthesizer(tmp_path):
    from singleshotpose_tpu.data.pipeline import Loader, PoseDataset
    listfile = tmp_path / "t.txt"
    listfile.write_text("x.jpg\n")
    ds = PoseDataset(str(listfile), train=True)
    with pytest.raises(ValueError, match="device_synth"):
        Loader(ds, batch_size=1, num_workers=0, backend="device_synth")


@pytest.fixture
def crowded_linemod(tmp_path):
    """Small-frame (160x120) crowded corpus: 5 objects x 4 frames with big
    masks, so companion placements collide often and the drop law matters."""
    from PIL import Image
    from singleshotpose_tpu.data.synth_multi import OCCLUSION_CLASSES
    rng = np.random.RandomState(3)
    root = tmp_path / "LINEMOD"
    objs = OCCLUSION_CLASSES[:5]
    for oi, obj in enumerate(objs):
        base = root / obj
        for d in ("JPEGImages", "mask", "labels"):
            (base / d).mkdir(parents=True)
        paths = []
        for i in range(4):
            img = rng.randint(0, 255, (120, 160, 3), np.uint8)
            m = np.zeros((120, 160), np.uint8)
            hw, hh = rng.randint(25, 45), rng.randint(20, 38)
            cx = rng.randint(hw, 160 - hw)
            cy = rng.randint(hh, 120 - hh)
            m[cy - hh:cy + hh, cx - hw:cx + hw] = 255
            name = f"00{i:04d}"
            Image.fromarray(img).save(base / "JPEGImages" / f"{name}.jpg")
            Image.fromarray(m).save(base / "mask" / f"{name[2:]}.png")
            lab = np.zeros(21, np.float32)
            lab[0] = oi
            lab[1:19:2] = np.clip(cx / 160.0 + rng.uniform(-0.1, 0.1, 9),
                                  0, 1)
            lab[2:19:2] = np.clip(cy / 120.0 + rng.uniform(-0.1, 0.1, 9),
                                  0, 1)
            lab[19:21] = [2 * hw / 160.0, 2 * hh / 120.0]
            np.savetxt(base / "labels" / f"{name}.txt", lab[None])
            paths.append(f"LINEMOD/{obj}/JPEGImages/{name}.jpg")
        (base / "train.txt").write_text("\n".join(paths) + "\n")

    import singleshotpose_tpu.data.synth_multi as sm
    orig = sm.ADD_OBJS
    sm.ADD_OBJS = dict(orig)
    sm.ADD_OBJS[objs[0]] = tuple(objs[1:])   # 4 companions for the base obj
    yield str(root), objs
    sm.ADD_OBJS = orig


def _objs_per_scene(labels, nl=NL):
    rows = np.asarray(labels).reshape(np.asarray(labels).shape[0], -1, nl)
    return (np.abs(rows[:, :, 1:]).sum(-1) > 0).sum(-1)


def test_placement_distribution_matches_host(crowded_linemod, tmp_path):
    """Objects-per-scene distribution: device path at the parity default
    (attempts == host max_attempts) matches the host synthesizer's mean
    within noise, while a low-attempts config measurably under-places —
    the documented divergence the default now avoids.  (TPU-v5e evidence
    at full scale is in device_synth.py's docstring table: host 5.94
    obj/scene vs device 6.01 at attempts=30, 5.10 at attempts=6.)
    """
    import jax.numpy as jnp
    from singleshotpose_tpu.data.pipeline import PoseDataset
    from singleshotpose_tpu.data.synth_multi import MultiObjectSynthesizer

    lm_root, objs = crowded_linemod
    N = 64
    lines = [os.path.join(lm_root, objs[0], "JPEGImages", f"00{i:04d}.jpg")
             for i in range(4)]
    listfile = tmp_path / "base.txt"
    listfile.write_text("\n".join(lines) + "\n")

    cfg = SynthConfig(linemod_root=lm_root)
    synth = MultiObjectSynthesizer(cfg)
    ds = PoseDataset(str(listfile), train=True, synthesizer=synth,
                     cache_decoded=True)
    rng = np.random.RandomState(11)
    host_counts = []
    for i in range(N):
        _, lab = synth(ds, lines[i % 4], (96, 96), rng)
        host_counts.append(
            (np.abs(np.asarray(lab).reshape(-1, NL)[:, 1:]).sum(-1) > 0)
            .sum())
    host_mean = float(np.mean(host_counts))
    assert host_mean > 2.5   # the corpus must actually be crowded

    bank = build_scene_bank(cfg, lines).device_put()

    def device_mean(attempts):
        st = DeviceSynthStatic.from_config(cfg, attempts=attempts)
        counts = []
        key = jax.random.PRNGKey(5)
        for i in range(N // 16):
            key, k = jax.random.split(key)
            idx = jnp.asarray((np.arange(16) + i * 16) % 4, jnp.int32)
            _, labels = synthesize_batch(bank, idx, k, out_w=96, out_h=96,
                                         st=st)
            counts.append(_objs_per_scene(labels))
        return float(np.concatenate(counts).mean())

    parity = device_mean(None)       # None → cfg.max_attempts (30)
    starved = device_mean(1)
    assert abs(parity - host_mean) < 0.5, (parity, host_mean)
    # sensitivity: 1 attempt must visibly under-place vs the parity default
    assert parity - starved > 0.5, (parity, starved)


def test_from_config_attempts_defaults_to_max_attempts():
    cfg = SynthConfig(linemod_root="/nonexistent", max_attempts=17)
    st = DeviceSynthStatic.from_config(cfg)
    assert st.attempts == 17
    assert DeviceSynthStatic.from_config(cfg, attempts=4).attempts == 4


def test_loader_threads_synth_knobs(fake_linemod, small_companions,
                                    tmp_path):
    """Loader(synth_attempts=, synth_propose_scale=) reach the static
    config that compiles the device program."""
    from singleshotpose_tpu.data.pipeline import (AugmentConfig, Loader,
                                                  PoseDataset)
    from singleshotpose_tpu.data.synth_multi import MultiObjectSynthesizer

    synth = MultiObjectSynthesizer(
        SynthConfig(linemod_root=fake_linemod, shift=10))
    listfile = tmp_path / "tr.txt"
    listfile.write_text(os.path.join(
        fake_linemod, "ape/JPEGImages/000000.jpg") + "\n")
    ds = PoseDataset(str(listfile), train=True, aug=AugmentConfig.multi(),
                     synthesizer=synth)
    ld = Loader(ds, batch_size=1, fixed_shape=(64, 64), num_workers=0,
                seed=0, backend="device_synth", synth_attempts=2,
                synth_propose_scale=2)
    next(iter(ld))
    assert ld._synth_static.attempts == 2
    assert ld._synth_static.propose_scale == 2
