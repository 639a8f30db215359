"""Host data pipeline: dataset, multi-scale schedule, prefetching loader.

Rebuild of ``listDataset`` + torch ``DataLoader`` (reference:
``dataset.py:14-141``, ``train.py:56-65``) as a TPU-feeding pipeline:

  * the multi-scale schedule is a pure function of a single authoritative
    ``seen`` counter owned by the loader — the reference instead lets every
    DataLoader worker bump a private copy by ``num_workers`` per sample
    (``dataset.py:138``), racy-by-design; here the schedule is deterministic
    given (seen, rng).
  * widths are drawn from the same staged 32-px buckets
    (``dataset.py:66-90`` single, ``dataset_multi.py:43-58`` multi), which
    bounds XLA recompilation to ≤20 shapes whose compiled executables are
    cached after first use.
  * samples are decoded/augmented by a thread pool (PIL/numpy release the
    GIL for the heavy parts) and batches are yielded as pinned host numpy,
    ready for an async ``jax.device_put`` double buffer.
"""

from __future__ import annotations

import dataclasses
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence, Tuple

import numpy as np

from ..utils.labels import (label_path_from_image, mask_path_from_image,
                            read_truths, read_truths_args)
from . import augment

__all__ = ["MultiScaleSchedule", "SINGLE_SCHEDULE", "MULTI_SCHEDULE",
           "AugmentConfig", "PoseDataset", "Loader", "load_image"]


def load_image(path: str) -> np.ndarray:
    """Decode an image file to RGB uint8 (H,W,3)."""
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


# ---------------------------------------------------------------------------
# multi-scale schedule
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MultiScaleSchedule:
    """Staged random input widths in ``cell_size`` multiples.

    ``stages`` = ((epoch_limit, base_cells, span_cells), ...) — while
    ``seen < limit·nbatches·batch_size`` the width is
    ``(base + U{0..span})·cell_size``; the last stage is open-ended.
    """
    stages: Tuple[Tuple[int, int, int], ...]
    cell_size: int = 32

    def draw(self, rng: np.random.RandomState, seen: int, nbatches: int,
             batch_size: int) -> int:
        for limit, base, span in self.stages[:-1]:
            if seen < limit * nbatches * batch_size:
                return (base + (rng.randint(0, span + 1) if span else 0)) \
                    * self.cell_size
        _, base, span = self.stages[-1]
        return (base + (rng.randint(0, span + 1) if span else 0)) * self.cell_size

    @property
    def all_widths(self) -> Tuple[int, ...]:
        ws = set()
        for _, base, span in self.stages:
            for k in range(span + 1):
                ws.add((base + k) * self.cell_size)
        return tuple(sorted(ws))


# reference: dataset.py:66-90 — 416 fixed, then progressively wider brackets
SINGLE_SCHEDULE = MultiScaleSchedule((
    (10, 13, 0), (20, 13, 7), (30, 12, 9), (40, 11, 11),
    (50, 10, 13), (60, 9, 15), (70, 8, 17), (0, 7, 19)))

# reference: dataset_multi.py:43-58 — milder brackets
MULTI_SCHEDULE = MultiScaleSchedule((
    (20, 13, 0), (40, 13, 3), (60, 12, 5), (80, 11, 7), (0, 10, 9)))


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    jitter: float = 0.2      # reference hard-codes these (dataset.py:94-97)
    hue: float = 0.1
    saturation: float = 1.5
    exposure: float = 1.5

    @classmethod
    def multi(cls) -> "AugmentConfig":
        return cls(jitter=0.1, hue=0.05)  # dataset_multi.py:62-65


class PoseDataset:
    """Image-list dataset (one line per image path).

    Train mode: VOC background substitution via the object mask + crop-jitter
    + HSV distortion, labels transformed accordingly.  Test mode: resize
    only, labels read raw into the padded 50-slot tensor.
    """

    def __init__(self, listfile: str, *, train: bool,
                 bg_file_names: Optional[Sequence[str]] = None,
                 aug: AugmentConfig = AugmentConfig(),
                 num_keypoints: int = 9, max_num_gt: int = 50,
                 label_path_fn: Callable[[str], str] = label_path_from_image,
                 synthesizer: Optional[Callable] = None,
                 cache_decoded: bool = False):
        with open(listfile) as f:
            self.lines = [ln.strip() for ln in f if ln.strip()]
        self.train = train
        self.bg_file_names = list(bg_file_names or [])
        self.aug = aug
        self.num_keypoints = num_keypoints
        self.max_num_gt = max_num_gt
        self.label_path_fn = label_path_fn
        self.synthesizer = synthesizer  # multi-object scene synthesis hook
        # RAM cache of decoded image/mask arrays: LINEMOD-sized train sets
        # (~200-1200 640×480 frames ≈ 0.2-1.1 GB) decode once, then every
        # later epoch runs at augment speed — the decisive fix for weak
        # hosts feeding a fast chip (pairs with the device-augment backend)
        self.cache_decoded = cache_decoded
        self._img_cache: dict = {}

    def _decode_cached(self, path: str, decode: Callable[[str], np.ndarray]
                       ) -> np.ndarray:
        if not self.cache_decoded:
            return decode(path)
        arr = self._img_cache.get(path)
        if arr is None:
            arr = decode(path)
            self._img_cache[path] = arr
        return arr

    def __len__(self) -> int:
        return len(self.lines)

    def _read_truths_full(self, imgpath: str) -> np.ndarray:
        """(n, 2K+3) rows for training (reference reads all 21 fields,
        ``image.py:81-84``)."""
        labpath = self.label_path_fn(imgpath)
        if os.path.exists(labpath) and os.path.getsize(labpath):
            return read_truths(labpath, self.num_keypoints)
        return np.zeros((0,), np.float32)

    def _read_truths_test(self, imgpath: str) -> np.ndarray:
        """Flat [class, x0..y8] per object — the reference test path drops
        the trailing x/y-range fields (``dataset.py:121``→``utils.py:309``)."""
        labpath = self.label_path_fn(imgpath)
        if os.path.exists(labpath) and os.path.getsize(labpath):
            return read_truths_args(labpath, self.num_keypoints)
        return np.zeros((0,), np.float32)

    def get_test_label(self, index: int) -> np.ndarray:
        """Flat padded label tensor for the test path.

        Divergence (reference bug not copied): the reference packs truncated
        19-field rows CONTIGUOUSLY into the 21-stride tensor
        (``dataset.py:121-127``) and then reads them back at stride 21
        (``valid.py:124``, ``valid_multi.py:103``) — correct only because
        its test label files happen to contain exactly one object; a second
        GT would be read misaligned.  Here each 19-field row is padded to
        the 21-float stride (trailing extent fields 0), so multi-GT test
        frames decode correctly; single-GT frames are bit-identical.
        """
        K = self.num_keypoints
        nl = 2 * K + 3
        truths = self._read_truths_test(self.lines[index]).reshape(-1)
        label = np.zeros((self.max_num_gt, nl), np.float32)
        if truths.size:
            rows = truths.reshape(-1, 2 * K + 1)[:self.max_num_gt]
            label[:rows.shape[0], :2 * K + 1] = rows
        return label.reshape(-1)

    def get_test(self, index: int, shape: Tuple[int, int]):
        """(img f32 HWC in [0,1], flat padded label) at fixed test shape."""
        imgpath = self.lines[index]
        img = load_image(imgpath)
        w, h = shape
        img = augment.resize_nearest(img, w, h)
        return img.astype(np.float32) / 255.0, self.get_test_label(index)

    def plan_train_sample(self, index: int, rng: np.random.RandomState):
        """Draw augmentation parameters for the native fused path.

        Consumes the SAME rng stream in the SAME order as :meth:`get_train`
        (bg pick → crop jitter → flip → HSV), so the two backends are
        parameter-identical given equal seeds.  Returns
        (imgpath, maskpath|None, bgpath|None, crop(pleft,ptop,cw,ch),
        hsv(dhue,dsat,dexp), flat label).
        """
        from PIL import Image
        imgpath = self.lines[index]
        with Image.open(imgpath) as im:
            ow, oh = im.size
        bgpath = None
        if self.bg_file_names:
            bgpath = self.bg_file_names[rng.randint(len(self.bg_file_names))]
        dw, dh = int(ow * self.aug.jitter), int(oh * self.aug.jitter)
        pleft = rng.randint(-dw, dw + 1)
        pright = rng.randint(-dw, dw + 1)
        ptop = rng.randint(-dh, dh + 1)
        pbot = rng.randint(-dh, dh + 1)
        swidth = ow - pleft - pright
        sheight = oh - ptop - pbot
        sx, sy = swidth / ow, sheight / oh
        _flip = bool(rng.randint(2))     # drawn, never applied (parity)
        dhue = rng.uniform(-self.aug.hue, self.aug.hue)
        dsat = augment.rand_scale(rng, self.aug.saturation)
        dexp = augment.rand_scale(rng, self.aug.exposure)
        dx = (pleft / ow) / sx
        dy = (ptop / oh) / sy
        label = augment.transform_truths(
            self._read_truths_full(imgpath), dx, dy, 1.0 / sx, 1.0 / sy,
            self.num_keypoints, self.max_num_gt)
        mask = mask_path_from_image(imgpath) if bgpath else None
        return (imgpath, mask, bgpath, (pleft, ptop, swidth, sheight),
                (dhue, dsat, dexp), label)

    def get_train(self, index: int, shape: Tuple[int, int],
                  rng: np.random.RandomState, as_uint8: bool = False):
        """One augmented train sample.  ``as_uint8`` skips the final /255
        (the augmentation pipeline is uint8 throughout) so batches transfer
        at 1/4 the bytes and normalize on device — bit-identical values."""
        imgpath = self.lines[index]
        if self.synthesizer is not None:
            img, label = self.synthesizer(self, imgpath, shape, rng)
        else:
            img = self._decode_cached(imgpath, load_image)
            mask = self._decode_cached(mask_path_from_image(imgpath),
                                       load_image)
            if self.bg_file_names:
                bg = load_image(
                    self.bg_file_names[rng.randint(len(self.bg_file_names))])
                img = augment.change_background(img, mask, bg)
            w, h = shape
            img, _flip, dx, dy, sx, sy = augment.data_augmentation(
                rng, img, w, h, self.aug.jitter, self.aug.hue,
                self.aug.saturation, self.aug.exposure)
            truths = self._read_truths_full(imgpath)
            label = augment.transform_truths(truths, dx, dy, 1.0 / sx,
                                             1.0 / sy, self.num_keypoints,
                                             self.max_num_gt)
        if as_uint8:
            return np.ascontiguousarray(img, np.uint8), label
        return img.astype(np.float32) / 255.0, label


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------


class Loader:
    """Batched, shuffled, thread-prefetched iterator over a PoseDataset.

    One authoritative ``seen`` counter drives the multi-scale schedule; each
    batch uses a single width so the stacked array is rectangular.  Yields
    (images (B,H,W,3) f32, labels (B, 50·(2K+3)) f32).
    """

    def __init__(self, dataset: PoseDataset, batch_size: int, *,
                 shuffle: bool = True, seen: int = 0,
                 schedule: Optional[MultiScaleSchedule] = SINGLE_SCHEDULE,
                 fixed_shape: Optional[Tuple[int, int]] = None,
                 num_workers: int = 8, seed: int = 0,
                 drop_last: bool = True, backend: str = "auto",
                 out_uint8: bool = False, out_yuv420: bool = False,
                 mesh=None, synth_attempts: Optional[int] = None,
                 synth_propose_scale: int = 4):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seen = seen
        self.schedule = schedule
        self.fixed_shape = fixed_shape
        self.rng = np.random.RandomState(seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers) \
            if num_workers > 0 else None
        self.drop_last = drop_last
        # yield uint8 images (normalize on-device) — 4x lighter host→device
        # transfer, bit-identical values (u8/255 either side); applies to
        # test AND train (the augmentation pipeline is uint8 throughout)
        self.out_uint8 = out_uint8
        # test-mode option: yield native-size YUV 4:2:0 planes (y, cbcr) —
        # 1.5 B/px, the device converts + resizes (ops/yuv.py); needs the
        # native decoder and a single shared source resolution
        self.out_yuv420 = out_yuv420
        if out_yuv420 and (dataset.train or backend == "python"):
            raise ValueError("out_yuv420 is a test-mode native-loader option")
        # native C++ fused decode/augment (singleshotpose_tpu/native); only
        # the non-synthesized paths have a native kernel
        self._native = None
        self._device = backend == "device"
        self._device_synth = False
        self._device_bank = False
        if backend in ("auto", "native") and dataset.synthesizer is None:
            try:
                from ..native import NativeLoader
                self._native = NativeLoader(nthreads=max(num_workers, 0))
            except (RuntimeError, OSError, ImportError):
                if backend == "native" or out_yuv420:
                    raise
        elif backend == "native" and dataset.synthesizer is not None:
            raise ValueError("native backend does not cover the "
                             "scene-synthesis path")
        elif backend == "device_synth":
            # on-device scene synthesis from an HBM-resident frame bank
            # (data/device_synth.py); bank built lazily on first iteration
            if dataset.synthesizer is None or \
                    not hasattr(dataset.synthesizer, "cfg"):
                raise ValueError(
                    "device_synth backend needs a PoseDataset with a "
                    "MultiObjectSynthesizer (its SynthConfig seeds the bank)")
            self._device_synth = True
            self._synth_bank = None
            # placement-parity/throughput knobs (device_synth.py docstring
            # has the measured table; None → host max_attempts drop law)
            self._synth_attempts = synth_attempts
            self._synth_propose_scale = synth_propose_scale
            # synthesis is one jitted device call — no host worker threads
            if self.pool is not None:
                self.pool.shutdown(wait=False)
                self.pool = None
            # optional ("data","model") mesh: the bank replicates, batch
            # indices shard over "data", and GSPMD partitions the scene
            # synthesis across chips — the data pipeline itself is SPMD
            self._synth_mesh = mesh
        elif backend == "device_bank":
            # single-object analogue of device_synth: the train corpus is
            # decoded ONCE into an HBM-resident DeviceFrameBank and every
            # batch is one jitted gather→crop→composite→HSV program
            # (data/device_bank.py) — zero per-batch host image traffic
            if dataset.synthesizer is not None:
                raise ValueError("device_bank does not cover the "
                                 "scene-synthesis path; use device_synth")
            if not dataset.train:
                raise ValueError("device_bank is a train-mode backend")
            self._device_bank = True
            self._frame_bank = None
            if self.pool is not None:       # batches are one device call
                self.pool.shutdown(wait=False)
                self.pool = None
            self._bank_mesh = mesh
        elif self._device:
            if dataset.synthesizer is not None:
                raise ValueError("device backend does not cover the "
                                 "scene-synthesis path")
            # host decodes at native size; composite/crop/HSV run on the
            # accelerator as one jitted program (data/device_augment.py)
            try:
                from ..native import NativeLoader
                self._dev_decoder = NativeLoader(nthreads=max(num_workers, 0))
            except (RuntimeError, OSError, ImportError):
                self._dev_decoder = None

    @property
    def nbatches(self) -> int:
        return len(self.ds) // self.batch_size

    def _batch_shape(self) -> Tuple[int, int]:
        if self.fixed_shape is not None or not self.ds.train:
            if self.fixed_shape is None:
                raise ValueError("test-mode Loader requires fixed_shape")
            return self.fixed_shape
        w = self.schedule.draw(self.rng, self.seen, max(self.nbatches, 1),
                               self.batch_size)
        return (w, w)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        end = self.nbatches * self.batch_size if self.drop_last else len(order)
        for start in range(0, end, self.batch_size):
            idxs = order[start:start + self.batch_size]
            shape = self._batch_shape()

            if self._device_synth:
                yield self._device_synth_batch(idxs, shape)
                continue

            if self._device_bank:
                yield self._device_bank_batch(idxs, shape)
                continue

            if self._device and self.ds.train:
                yield self._device_batch(idxs, shape)
                continue

            if self._native is not None:
                yield self._native_batch(idxs, shape)
                continue

            if self.ds.train:
                seeds = self.rng.randint(0, 2 ** 31 - 1, size=len(idxs))
                def one(args):
                    i, s = args
                    return self.ds.get_train(int(i), shape,
                                             np.random.RandomState(int(s)),
                                             as_uint8=self.out_uint8)
                work = list(zip(idxs, seeds))
            else:
                def one(i):
                    img, lab = self.ds.get_test(int(i), shape)
                    if self.out_uint8:
                        img = (img * 255.0).astype(np.uint8)
                    return img, lab
                work = list(idxs)

            if self.pool is not None:
                results = list(self.pool.map(one, work))
            else:
                results = [one(wk) for wk in work]
            imgs = np.stack([r[0] for r in results])
            labels = np.stack([r[1] for r in results])
            self.seen += len(idxs)
            yield imgs, labels

    def _device_synth_batch(self, idxs, shape):
        """Synthesize one multi-object batch fully on device.

        First call decodes the whole LINEMOD corpus into an HBM-resident
        frame bank (``data/device_synth.py``); afterwards batches are a pure
        jitted function of (bank, indices, PRNG key) — zero host↔device
        image traffic.  Yields device arrays (images f32, labels f32).
        """
        import jax

        from . import device_synth as DS

        if self._synth_bank is None:
            scfg = self.ds.synthesizer.cfg
            t0 = time.time()
            bank = DS.build_scene_bank(scfg, self.ds.lines,
                                       self.ds.bg_file_names)
            if self._synth_mesh is not None:
                from ..parallel.sharding import replicated
                bank = bank.device_put(replicated(self._synth_mesh))
            else:
                bank = bank.device_put()
            self._synth_bank = bank
            self._synth_static = DS.DeviceSynthStatic.from_config(
                scfg, attempts=self._synth_attempts,
                propose_scale=self._synth_propose_scale)
            print(f"device_synth bank: {self._synth_bank.images.shape[0]} "
                f"frames, {self._synth_bank.nbytes() / 1e6:.0f} MB in HBM "
                f"({time.time() - t0:.1f}s to build)")
        w, h = shape
        key = jax.random.PRNGKey(self.rng.randint(2 ** 31 - 1))
        base_idx = np.asarray(idxs, np.int32)
        if self._synth_mesh is not None:
            from ..parallel.sharding import batch_sharding
            base_idx = jax.device_put(
                base_idx, batch_sharding(self._synth_mesh, 1))
        imgs, labels = DS.synthesize_batch(
            self._synth_bank, base_idx, key,
            out_w=w, out_h=h, st=self._synth_static)
        self.seen += len(idxs)
        return imgs, labels

    def _device_bank_batch(self, idxs, shape):
        """One single-object train batch from the HBM frame bank.

        First call decodes the corpus into a device-resident
        ``DeviceFrameBank`` (``data/device_bank.py``); afterwards each batch
        is one jitted program of (bank, indices, host-drawn params).  The
        rng stream matches the ``device`` backend draw-for-draw (bg picks
        then ``draw_params``), so given equal seeds the two backends yield
        bit-identical images.  Yields device arrays (images f32, labels f32).
        """
        import jax

        from . import device_augment as DA
        from . import device_bank as DB

        if self._frame_bank is None:
            decode = None
            try:
                from ..native import NativeLoader
                decode = NativeLoader(nthreads=0).decode
            except (RuntimeError, OSError, ImportError):
                pass
            t0 = time.time()
            bank = DB.build_frame_bank(self.ds, decode=decode)
            if self._bank_mesh is not None:
                from ..parallel.sharding import replicated
                bank = bank.device_put(replicated(self._bank_mesh))
            else:
                bank = bank.device_put()
            self._frame_bank = bank
            print(f"device_bank: {bank.images.shape[0]} frames, "
                  f"{bank.nbytes() / 1e6:.0f} MB in HBM "
                  f"({time.time() - t0:.1f}s to build)")
        bank = self._frame_bank
        w, h = shape
        B = len(idxs)
        ih, iw = bank.frame_shape
        if self.ds.bg_file_names:
            # same stream as _device_batch: one scalar draw per sample over
            # the FULL bg list, folded onto the bank's sampled rows
            bg_idxs = np.array([
                self.rng.randint(len(self.ds.bg_file_names))
                for _ in range(B)], np.int32) % bank.bgs.shape[0]
        else:
            bg_idxs = np.zeros(B, np.int32)
        params, _lab = DA.draw_params(
            self.rng, B, iw, ih, jitter=self.ds.aug.jitter,
            hue=self.ds.aug.hue, saturation=self.ds.aug.saturation,
            exposure=self.ds.aug.exposure)
        rows = np.asarray(idxs, np.int32)
        if self._bank_mesh is not None:
            from ..parallel.sharding import batch_sharding
            sh1 = batch_sharding(self._bank_mesh, 1)
            rows = jax.device_put(rows, sh1)
            bg_idxs = jax.device_put(bg_idxs, sh1)
            params = jax.tree.map(lambda a: jax.device_put(a, sh1), params)
        imgs, labels = DB.augment_bank_batch(
            bank, rows, bg_idxs, params, out_w=w, out_h=h,
            K=self.ds.num_keypoints)
        self.seen += B
        return imgs, labels

    def _device_batch(self, idxs, shape):
        """Decode on host, augment on the accelerator.

        Yields (device f32 images (B,h,w,3), labels) — the images are already
        on the default device, augmented by one jitted XLA program.  All
        source images must share one native size (true for LINEMOD).
        """
        import jax.numpy as jnp

        from ..utils.labels import read_truths
        from . import device_augment as DA

        w, h = shape

        def decode(path):
            if self._dev_decoder is not None:
                return self._dev_decoder.decode(path)
            return load_image(path)

        def one(i):
            imgpath = self.ds.lines[int(i)]
            img = self.ds._decode_cached(imgpath, decode)
            mask = self.ds._decode_cached(mask_path_from_image(imgpath),
                                          decode)
            return img, mask

        work = list(idxs)
        if self.pool is not None:
            decoded = list(self.pool.map(one, work))
        else:
            decoded = [one(i) for i in work]
        # keep everything uint8: augment_batch normalizes on device, so the
        # three native-size buffers transfer at 1/4 the float bandwidth
        imgs = np.stack([d[0] for d in decoded])
        ih, iw = imgs.shape[1:3]
        masks = np.stack([d[1][..., :1] for d in decoded])

        B = len(work)
        if self.ds.bg_file_names:
            bgs = np.stack([
                augment.resize_nearest(
                    decode(self.ds.bg_file_names[
                        self.rng.randint(len(self.ds.bg_file_names))]),
                    iw, ih)
                for _ in range(B)])
        else:
            bgs = np.zeros_like(imgs)
            masks = np.full_like(masks, 255)

        params, lab_tf = DA.draw_params(
            self.rng, B, iw, ih, jitter=self.ds.aug.jitter,
            hue=self.ds.aug.hue, saturation=self.ds.aug.saturation,
            exposure=self.ds.aug.exposure)
        out = DA.augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                               jnp.asarray(bgs), params, w, h)

        labels = np.stack([
            augment.transform_truths(
                self.ds._read_truths_full(self.ds.lines[int(i)]),
                lab_tf[b, 0], lab_tf[b, 1],
                1.0 / lab_tf[b, 2], 1.0 / lab_tf[b, 3],
                self.ds.num_keypoints, self.ds.max_num_gt)
            for b, i in enumerate(work)])
        self.seen += B
        return out, labels

    def _native_batch(self, idxs, shape):
        """One batch through the C++ fused decode/augment thread pool."""
        w, h = shape
        if self.ds.train:
            seeds = self.rng.randint(0, 2 ** 31 - 1, size=len(idxs))
            plans = [self.ds.plan_train_sample(int(i),
                                               np.random.RandomState(int(s)))
                     for i, s in zip(idxs, seeds)]
            batch_fn = self._native.train_batch_u8 if self.out_uint8 \
                else self._native.train_batch
            imgs = batch_fn(
                [p[0] for p in plans], [p[1] for p in plans],
                [p[2] for p in plans],
                np.array([p[3] for p in plans], np.int32),
                np.array([p[4] for p in plans], np.float32), w, h)
            labels = np.stack([p[5] for p in plans])
        else:
            paths = [self.ds.lines[int(i)] for i in idxs]
            if self.out_yuv420:
                imgs = self._native.test_batch_yuv420(paths)  # (y, cbcr)
            elif self.out_uint8:
                imgs = self._native.test_batch_u8(paths, w, h)
            else:
                imgs = self._native.test_batch(paths, w, h)
            labels = np.stack([self.ds.get_test_label(int(i))
                               for i in idxs])
        self.seen += len(idxs)
        return imgs, labels
