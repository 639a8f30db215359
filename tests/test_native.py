"""Native C++ loader: build, decode correctness, and parity with the
pure-Python augmentation path under identical rng seeds."""

import os
import time

import numpy as np
import pytest

from singleshotpose_tpu.native import load_native, native_available


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def loader():
    from singleshotpose_tpu.native import NativeLoader
    return NativeLoader(nthreads=4)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image
    tmp = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    jpg = tmp / "a.jpg"
    png = tmp / "b.png"
    arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
    Image.fromarray(arr).save(jpg, quality=95)
    parr = rng.randint(0, 255, (32, 40, 3), np.uint8)
    Image.fromarray(parr).save(png)
    gray = tmp / "g.png"
    Image.fromarray(rng.randint(0, 255, (16, 16), np.uint8), "L").save(gray)
    return {"jpg": str(jpg), "png": str(png), "gray": str(gray), "parr": parr}


def test_decode_png_bit_exact(loader, images):
    out = loader.decode(images["png"])
    np.testing.assert_array_equal(out, images["parr"])


def test_decode_jpeg_matches_pil(loader, images):
    from PIL import Image
    ours = loader.decode(images["jpg"])
    ref = np.asarray(Image.open(images["jpg"]).convert("RGB"))
    assert ours.shape == ref.shape
    # both use libjpeg; allow ±2 levels for DCT rounding mode differences
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_decode_gray_png_promotes_rgb(loader, images):
    out = loader.decode(images["gray"])
    assert out.shape == (16, 16, 3)
    assert (out[..., 0] == out[..., 1]).all()


def test_decode_missing_file_raises(loader):
    with pytest.raises(IOError):
        loader.decode("/nonexistent/x.jpg")


def test_native_python_loader_parity(tmp_path):
    """Same seed ⇒ same labels, and images that agree to quantization."""
    from PIL import Image
    from singleshotpose_tpu.data.pipeline import Loader, PoseDataset
    rng = np.random.RandomState(1)
    root = tmp_path / "obj"
    for d in ("JPEGImages", "mask", "labels"):
        (root / d).mkdir(parents=True)
    paths = []
    for i in range(4):
        arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
        name = f"{i:06d}"
        # PNG images: decode is bit-exact in both backends, isolating the
        # augmentation math in the comparison
        p = root / "JPEGImages" / f"{name}.png"
        Image.fromarray(arr).save(p)
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
    Image.fromarray(rng.randint(0, 255, (24, 24, 3), np.uint8)).save(bg)

    def make(backend):
        ds = PoseDataset(str(lst), train=True, bg_file_names=[str(bg)])
        return Loader(ds, batch_size=4, fixed_shape=(96, 96), num_workers=2,
                      seed=7, backend=backend)

    imgs_py, labels_py = next(iter(make("python")))
    imgs_nat, labels_nat = next(iter(make("native")))
    np.testing.assert_allclose(labels_nat, labels_py, rtol=1e-6, atol=1e-6)
    diff = np.abs(imgs_nat - imgs_py)
    # identical params; small per-pixel differences from independent uint8
    # rounding paths in HSV round-trips
    assert diff.mean() < 0.01, diff.mean()
    assert (diff < 0.1).mean() > 0.97

    # test-path parity
    def make_test(backend):
        ds = PoseDataset(str(lst), train=False)
        return Loader(ds, batch_size=4, fixed_shape=(96, 96), shuffle=False,
                      num_workers=0, drop_last=False, backend=backend)

    ti_py, tl_py = next(iter(make_test("python")))
    ti_nat, tl_nat = next(iter(make_test("native")))
    np.testing.assert_array_equal(tl_nat, tl_py)
    np.testing.assert_allclose(ti_nat, ti_py, atol=1 / 255.0 + 1e-6)


def test_native_faster_than_python(tmp_path):
    """Throughput sanity: the fused native batch should beat PIL+numpy."""
    from PIL import Image
    from singleshotpose_tpu.data.pipeline import Loader, PoseDataset
    rng = np.random.RandomState(2)
    root = tmp_path / "obj"
    for d in ("JPEGImages", "mask", "labels"):
        (root / d).mkdir(parents=True)
    paths = []
    for i in range(16):
        arr = rng.randint(0, 255, (480, 640, 3), np.uint8)
        name = f"{i:06d}"
        p = root / "JPEGImages" / f"{name}.jpg"
        Image.fromarray(arr).save(p)
        m = np.zeros((480, 640), np.uint8)
        m[100:300, 200:400] = 255
        Image.fromarray(m).save(root / "mask" / f"{name[2:]}.png")
        lab = np.zeros(21, np.float32)
        lab[1:19] = rng.uniform(0.3, 0.7, 18)
        lab[19:21] = [0.3, 0.4]
        np.savetxt(root / "labels" / f"{name}.txt", lab[None])
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")
    bg = tmp_path / "bg.jpg"
    Image.fromarray(rng.randint(0, 255, (480, 640, 3), np.uint8)).save(bg)

    def run(backend):
        ds = PoseDataset(str(lst), train=True, bg_file_names=[str(bg)])
        ld = Loader(ds, batch_size=16, fixed_shape=(416, 416), num_workers=8,
                    seed=0, backend=backend)
        t0 = time.perf_counter()
        for _ in ld:
            pass
        return time.perf_counter() - t0

    run("python")  # warm page cache
    t_py = run("python")
    t_nat = run("native")
    # informative bound — native should not be slower
    assert t_nat < t_py * 1.1, (t_nat, t_py)


def test_bg_decode_at_scale_stays_close(tmp_path):
    """A large JPEG background decodes at DCT scale toward the compositing
    dims (libjpeg scale_denom, cached) — the composite stays visually
    equivalent to the python path's full-resolution decode."""
    from PIL import Image
    from singleshotpose_tpu.data.pipeline import Loader, PoseDataset
    rng = np.random.RandomState(3)
    root = tmp_path / "obj"
    for d in ("JPEGImages", "mask", "labels"):
        (root / d).mkdir(parents=True)
    arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
    p = root / "JPEGImages" / "000000.png"
    Image.fromarray(arr).save(p)
    m = np.zeros((48, 64), np.uint8)
    m[10:30, 20:40] = 255
    Image.fromarray(m).save(root / "mask" / "0000.png")
    lab = np.zeros(21, np.float32)
    lab[1:19] = rng.uniform(0.3, 0.7, 18)
    lab[19:21] = [0.3, 0.4]
    np.savetxt(root / "labels" / "000000.txt", lab[None])
    lst = tmp_path / "train.txt"
    lst.write_text(str(p) + "\n")
    # 800x600 smooth background >= 2x the 64x48 foreground in both dims,
    # so the native path decodes it at scale_denom > 1
    yy, xx = np.mgrid[0:600, 0:800]
    big = np.stack([xx % 256, yy % 256, (xx + yy) % 256],
                   axis=-1).astype(np.uint8)
    bg = tmp_path / "bg.jpg"
    Image.fromarray(big).save(bg, quality=92)

    def make(backend):
        ds = PoseDataset(str(lst), train=True, bg_file_names=[str(bg)])
        return Loader(ds, batch_size=1, fixed_shape=(96, 96), num_workers=0,
                      seed=7, backend=backend)

    imgs_py, labels_py = next(iter(make("python")))
    imgs_nat, labels_nat = next(iter(make("native")))
    np.testing.assert_allclose(labels_nat, labels_py, rtol=1e-6, atol=1e-6)
    diff = np.abs(imgs_nat - imgs_py)
    # not bit-equal (different decode scale) but visually equivalent
    assert diff.mean() < 0.02, diff.mean()
