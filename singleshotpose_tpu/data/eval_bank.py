"""HBM-resident eval bank: the test split decoded ONCE into device memory.

The reference re-reads and re-decodes the full test split from disk on every
in-training eval epoch (reference: ``train.py:133-146`` rebuilds its
DataLoader each call; ``valid.py:94-101``).  Through a bandwidth-limited
host<->device link the per-frame transfer also dominates end-to-end eval —
the measured numbers in BENCH move 2x with link load.

TPU-native alternative (same recipe as ``device_bank``/``device_synth`` for
training): decode + resize the split once to eval-size u8 frames, park them
in HBM batch-major, and every subsequent eval pass is pure device compute —
zero host decode, zero per-frame transfer, and therefore *link-insensitive*.
Eval pixels are bit-identical to the ``transfer="rgb"`` path (the bank stores
exactly the u8 batches that path would ship).

Memory: u8 at eval size — 672x672x3 = 1.35 MB/frame, so a 1k-frame LINEMOD
test split is ~1.4 GB (v5e has 16 GB).  A small LRU (``_CACHE_SLOTS = 8``
banks, sized for the 6-object occlusion sweep) keeps repeat evals from
rebuilding while bounding the footprint.

Usage: ``run_validation(..., transfer="bank")`` (drivers.py) or
``TrainRunConfig.eval_transfer = "bank"`` for the in-training cadence, where
the decode cost amortizes across every eval epoch.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Hashable, Iterator, Optional, Tuple

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["EvalBank", "build_eval_bank", "get_eval_bank", "clear_cache"]


@dataclasses.dataclass
class EvalBank:
    """Device-resident eval batches.

    ``images``: (nbatches, B, H, W, 3) u8 on device, batch-major so batch i
    is a cheap leading-axis slice (no cross-device gather under a mesh —
    the batch axis, not the frame axis, is what shards over ``data``).
    ``labels``: (nbatches, B, 50*(2K+3)) f32 on HOST — the metric suite is
    host-side.  Frames past the true split length are zero rows; zero labels
    never enter the metrics (the GT gather masks on label[...,1] != 0).
    """
    images: jax.Array
    labels: np.ndarray
    n: int                      # true frame count (<= nbatches*B)

    def __iter__(self) -> Iterator[Tuple[jax.Array, np.ndarray]]:
        for i in range(self.images.shape[0]):
            yield self.images[i], self.labels[i]

    def nbytes(self) -> int:
        return self.images.size  # u8: 1 byte/element


def build_eval_bank(dataset, out_shape: Tuple[int, int], batch_size: int, *,
                    num_workers: int = 8, mesh=None) -> EvalBank:
    """Decode ``dataset`` (test mode) at ``out_shape`` into an EvalBank.

    Decode reuses the Loader machinery (native C++ JPEG path when built), so
    bank pixels are bit-identical to what ``transfer="rgb"`` would ship
    per batch.  Under a ``("data","model")`` mesh the bank is placed with
    batches sharded over ``data`` (requires ``batch_size % dp == 0``).
    """
    from .pipeline import Loader

    if dataset.train:
        raise ValueError("EvalBank is a test-mode construct")
    if jax.process_count() > 1 and mesh is None:
        # a default device_put would park the bank on this process's local
        # device only — meaningless in a multi-controller program.  The
        # multi-host path below needs the global mesh to place shards.
        raise ValueError("build_eval_bank under multi-host needs the global "
                         "mesh (pass mesh=...)")
    loader = Loader(dataset, batch_size, shuffle=False, schedule=None,
                    fixed_shape=out_shape, num_workers=num_workers,
                    drop_last=False, out_uint8=True)
    imgs, labs = [], []
    for im, lb in loader:
        imgs.append(im)
        labs.append(lb)
    if not imgs:
        raise ValueError("empty eval dataset")
    images = np.concatenate(imgs, axis=0)
    labels = np.concatenate(labs, axis=0).astype(np.float32)
    n = images.shape[0]
    pad = (-n) % batch_size
    if pad:
        images = np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
        labels = np.concatenate(
            [labels, np.zeros((pad,) + labels.shape[1:], labels.dtype)])
    nb = images.shape[0] // batch_size
    images = images.reshape((nb, batch_size) + images.shape[1:])
    labels = labels.reshape((nb, batch_size) + labels.shape[1:])
    if mesh is not None:
        dp = int(mesh.shape["data"])
        if batch_size % dp:
            raise ValueError(
                f"transfer='bank' under a mesh needs batch_size divisible "
                f"by the data axis ({batch_size} % {dp})")
        sharding = NamedSharding(mesh, P(None, "data"))
        if jax.process_count() > 1:
            # Multi-host: every process decoded the identical full split
            # (the eval set is NOT dataset-sharded — host-side metrics need
            # the whole split's labels anyway), so each process materializes
            # exactly its addressable shards from its full host copy.
            # make_array_from_callback fits this replicated-host-data shape
            # better than make_array_from_process_local_data (which expects
            # each process to hold only its own slice).
            dev_images = jax.make_array_from_callback(
                images.shape, sharding, lambda idx: images[idx])
        else:
            dev_images = jax.device_put(images, sharding)
    else:
        dev_images = jax.device_put(images)
    return EvalBank(images=dev_images, labels=labels, n=n)


# LRU of built banks: the in-training eval cadence calls run_validation with
# a fresh Loader every eval epoch; the bank must outlive the call.  8 slots
# cover the multi trainer's 6-object occlusion sweep (reference
# ``train_multi.py:277-297``) without thrash; worst-case footprint is
# 8 x (1,214 OCCLUSION frames x 416^2 u8) ~ 5 GB of a v5e's 16 GB HBM.
# Lower the module variable (or ``clear_cache()``) if the budget is tight.
_CACHE: "OrderedDict[Hashable, EvalBank]" = OrderedDict()
_CACHE_SLOTS = 8


def get_eval_bank(dataset, out_shape: Tuple[int, int], batch_size: int, *,
                  cache_key: Hashable, num_workers: int = 8,
                  mesh=None) -> EvalBank:
    """LRU-cached :func:`build_eval_bank` (key must capture the label
    source too — the occlusion sweep reuses images under per-object labels)."""
    bank = _CACHE.get(cache_key)
    if bank is None:
        bank = build_eval_bank(dataset, out_shape, batch_size,
                               num_workers=num_workers, mesh=mesh)
        _CACHE[cache_key] = bank
        while len(_CACHE) > _CACHE_SLOTS:
            _CACHE.popitem(last=False)
    else:
        _CACHE.move_to_end(cache_key)
    return bank


def clear_cache() -> None:
    _CACHE.clear()
