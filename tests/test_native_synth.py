"""Native scene-synthesis pixel core (native/ssp_native.cpp synth entry
points) vs the numpy ops in data/synth_multi.py.

The load-bearing claim: with ``SynthConfig(native="on")`` the synthesizer
produces BIT-IDENTICAL scenes and labels to ``native="off"`` under the same
seed — the C++ path fuses crop/resize/roll/flip into one gather and keeps
every rng draw in Python, so enabling it changes nothing but speed.
"""

import os

import numpy as np
import pytest

from singleshotpose_tpu.data import augment
from singleshotpose_tpu.data import synth_multi as sm
from singleshotpose_tpu.data.pipeline import PoseDataset

try:
    from singleshotpose_tpu.native import NativeSynthOps
    _OPS = NativeSynthOps()
except Exception:                                    # toolchain unavailable
    _OPS = None

pytestmark = pytest.mark.skipif(_OPS is None,
                                reason="native toolchain unavailable")

from test_synth_multi import fake_linemod  # noqa: F401  (fixture)


def _rand_pair(rng, h=37, w=53):
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    # mix of hard-binary and gray mask values (exercises exact f32 blends)
    mask = rng.choice([0, 37, 200, 255], (h, w, 3)).astype(np.uint8)
    return img, mask


@pytest.mark.parametrize("pleft,ptop,sw,sh", [
    (0, 0, 53, 37),          # identity crop
    (-7, -5, 60, 44),        # padded on the low side
    (10, 8, 60, 44),         # padded on the high side
    (3, 2, 40, 30),          # interior crop, downscale
    (3, 2, 20, 15),          # strong upscale
])
def test_masked_resize_matches_numpy(pleft, ptop, sw, sh):
    rng = np.random.RandomState(0)
    img, mask = _rand_pair(rng)
    for flip in (False, True):
        for shift in ((0, 0), (5, -3), (-60, 41)):
            want_img = augment.crop_resize(img, pleft, ptop, sw, sh, 32, 24)
            want_mask = augment.crop_resize(mask, pleft, ptop, sw, sh,
                                            32, 24)
            want_img = np.roll(want_img, (shift[1], shift[0]), axis=(0, 1))
            want_mask = np.roll(want_mask, (shift[1], shift[0]), axis=(0, 1))
            if flip:
                want_img = want_img[:, ::-1]
                want_mask = want_mask[:, ::-1]
            want_masked = sm.mask_foreground(want_img, want_mask)
            got_m, got_k = _OPS.masked_resize(
                img, mask, pleft, ptop, sw, sh, 32, 24,
                shift_x=shift[0], shift_y=shift[1], flip=flip)
            np.testing.assert_array_equal(got_k, want_mask)
            np.testing.assert_array_equal(got_m, want_masked)


def test_overlap_counts_match_numpy():
    rng = np.random.RandomState(3)
    img, mask = _rand_pair(rng)
    total = rng.choice([0, 150, 255], (24, 32, 3)).astype(np.uint8)
    got_m, got_k, area, inter = _OPS.masked_resize(
        img, mask, 2, 1, 40, 30, 32, 24, total=total, thresh=200)
    xx = got_k.max(-1) > 200
    yy = total.max(-1) > 200
    assert area == int(xx.sum())
    assert inter == int((xx & yy).sum())


def test_composite_matches_numpy():
    rng = np.random.RandomState(5)
    fg = rng.randint(0, 256, (24, 32, 3), np.uint8)
    mask = rng.choice([0, 37, 200, 255], (24, 32, 3)).astype(np.uint8)
    canvas = rng.randint(0, 256, (24, 32, 3), np.uint8)
    total = rng.randint(0, 256, (24, 32, 3), np.uint8)
    want_canvas = sm.superimpose(fg, mask, canvas)
    want_total = sm.superimpose_masks(mask, total)
    got_canvas, got_total = canvas.copy(), total.copy()
    _OPS.composite(fg, mask, got_canvas, got_total)
    np.testing.assert_array_equal(got_canvas, want_canvas)
    np.testing.assert_array_equal(got_total, want_total)
    # canvas-only variant (final base re-paste)
    got2 = canvas.copy()
    _OPS.composite(fg, mask, got2)
    np.testing.assert_array_equal(got2, want_canvas)


def test_change_background_matches_numpy():
    rng = np.random.RandomState(7)
    canvas = rng.randint(0, 256, (24, 32, 3), np.uint8)
    mask = rng.choice([0, 37, 200, 255], (24, 32, 3)).astype(np.uint8)
    bg = rng.randint(0, 256, (17, 11, 3), np.uint8)
    want = augment.change_background(canvas, mask, bg)
    got = canvas.copy()
    _OPS.change_background(got, mask, bg)
    np.testing.assert_array_equal(got, want)


def _synth_scene(fake_linemod, tmp_path, native, seed):  # noqa: F811
    from PIL import Image
    bg = tmp_path / "bg.jpg"
    if not bg.exists():
        Image.fromarray(np.random.RandomState(9).randint(
            0, 256, (64, 96, 3), np.uint8)).save(bg)
    cfg = sm.SynthConfig(linemod_root=fake_linemod, max_attempts=10,
                         native=native)
    synth = sm.MultiObjectSynthesizer(cfg)
    listfile = tmp_path / f"train_{native}.txt"
    imgpath = os.path.join(fake_linemod, "ape/JPEGImages/000000.jpg")
    listfile.write_text(imgpath + "\n")
    ds = PoseDataset(str(listfile), train=True, bg_file_names=[str(bg)],
                     synthesizer=synth)
    rng = np.random.RandomState(seed)
    return ds.get_train(0, (416, 416), rng)


def test_synthesizer_native_bitexact_vs_numpy(fake_linemod,  # noqa: F811
                                              tmp_path):
    """Whole scenes: native="on" ≡ native="off" bit-for-bit, many seeds
    (acceptance/rejection control flow included)."""
    orig = sm.ADD_OBJS
    sm.ADD_OBJS = dict(orig)
    sm.ADD_OBJS["ape"] = ("can", "cat")
    try:
        for seed in (0, 1, 2, 3, 11):
            img_n, lab_n = _synth_scene(fake_linemod, tmp_path, "on", seed)
            img_p, lab_p = _synth_scene(fake_linemod, tmp_path, "off", seed)
            np.testing.assert_array_equal(img_n, img_p, err_msg=f"{seed=}")
            np.testing.assert_array_equal(lab_n, lab_p, err_msg=f"{seed=}")
    finally:
        sm.ADD_OBJS = orig
