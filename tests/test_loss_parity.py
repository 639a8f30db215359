"""A/B parity: our vectorized region loss vs the reference's torch
RegionLoss on identical inputs (reference run CPU-only via cuda shims)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from singleshotpose_tpu.ops.losses import RegionLossConfig, region_loss


@pytest.fixture
def reference_region_loss(reference_dir, monkeypatch):
    torch = pytest.importorskip("torch")
    # CPU shims for the reference's hard-coded .cuda() calls
    monkeypatch.setattr(torch.cuda, "LongTensor", torch.LongTensor,
                        raising=False)
    monkeypatch.setattr(torch.cuda, "FloatTensor", torch.FloatTensor,
                        raising=False)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.syspath_prepend(reference_dir)
    for mod in ("region_loss", "utils"):
        sys.modules.pop(mod, None)
    # torch-0.4 era `.data[0]` scalar indexing raises on modern torch;
    # shim it to .item() when loading the reference module for the A/B
    import types
    src = open(os.path.join(reference_dir, "region_loss.py")).read()
    src = src.replace(".data[0]", ".item()")
    ref_rl = types.ModuleType("ref_region_loss")
    exec(compile(src, os.path.join(reference_dir, "region_loss.py"), "exec"),
         ref_rl.__dict__)
    yield ref_rl
    for mod in ("region_loss", "utils"):
        sys.modules.pop(mod, None)


def _inputs(B=2, K=9, C=1, nA=1, H=4, W=4, n_gt=1, seed=0):
    # n_gt=1: the reference's pass-1 `torch.max(cur_confs, ...)` relies on
    # legacy same-numel elementwise semantics (torch 0.3) that raise on
    # modern torch once a second GT makes the shapes (1,4,4) vs (16,);
    # multi-GT equivalence is covered by tests/test_targets.py golden values.
    rng = np.random.RandomState(seed)
    out_nchw = rng.randn(B, nA * (2 * K + 1 + C), H, W).astype(np.float32)
    t = np.zeros((B, 50 * 21), np.float32)
    tt = t.reshape(B, 50, 21)
    for b in range(B):
        for k in range(n_gt):
            tt[b, k, 0] = 0
            # keep keypoints on-grid so centroid cells are interior
            tt[b, k, 1:19] = rng.uniform(0.15, 0.85, 18)
            tt[b, k, 19:21] = [0.3, 0.35]
    return out_nchw, t


@pytest.mark.parametrize("epoch", [10, 100])
def test_single_object_loss_matches_reference(reference_region_loss, epoch):
    torch = pytest.importorskip("torch")
    K, C, nA, H, W = 9, 1, 1, 4, 4
    out_nchw, target = _inputs(H=H, W=W)

    ref = reference_region_loss.RegionLoss(
        num_keypoints=K, num_classes=C, anchors=[], num_anchors=nA,
        pretrain_num_epochs=15)
    ref.seen = 10000
    with torch.no_grad():
        ref_loss = ref(torch.from_numpy(out_nchw.copy()),
                       torch.from_numpy(target.copy()), epoch)

    # ours takes NHWC
    out_nhwc = jnp.asarray(out_nchw.transpose(0, 2, 3, 1))
    cfg = RegionLossConfig.single(pretrain_num_epochs=15)
    loss, stats = region_loss(out_nhwc, jnp.asarray(target), epoch, cfg)

    assert float(loss) == pytest.approx(float(ref_loss), rel=2e-4), \
        (float(loss), float(ref_loss), epoch)
    assert int(stats["nGT"]) == 2
