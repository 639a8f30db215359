"""Training-trajectory A/B: N full SGD steps (forward → region loss →
backward → update, BN in train mode) on identical synthetic batches, our
fused JAX step vs the reference torch stack (reference: ``train.py:76-129``
hot loop, ``region_loss.py:80-175``, torch SGD semantics ``train.py:381-388``).

The strongest end-to-end parity evidence obtainable without real LINEMOD:
if model numerics, target assignment, loss algebra, BN updates, and
optimizer semantics all match, the loss curves track within f32 tolerance
for the whole trajectory.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from singleshotpose_tpu.config import parse_cfg
from singleshotpose_tpu.models.darknet import DarknetSpec
from singleshotpose_tpu.ops.losses import RegionLossConfig
from singleshotpose_tpu.training import init_train_state, make_train_step
from singleshotpose_tpu.weights import save_weights

from test_drivers import TINY_CFG

N_STEPS = 12
B, IMG = 2, 128
LR, MOM, DECAY = 0.001, 0.9, 0.0005


def _batches(seed=0):
    """Identical per-step (images NCHW f32, padded 21-stride targets)."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(N_STEPS):
        imgs = rng.rand(B, 3, IMG, IMG).astype(np.float32)
        t = np.zeros((B, 50 * 21), np.float32)
        tt = t.reshape(B, 50, 21)
        for b in range(B):
            # one GT per image: the reference pass-1 torch.max relies on
            # legacy same-numel semantics that raise on modern torch with >1
            tt[b, 0, 1:19] = rng.uniform(0.15, 0.85, 18)
            tt[b, 0, 19:21] = [0.3, 0.35]
        out.append((imgs, t))
    return out


@pytest.fixture
def reference_stack(reference_dir, monkeypatch, tmp_path):
    """(torch, ref Darknet class, patched ref RegionLoss module)."""
    torch = pytest.importorskip("torch")
    monkeypatch.setattr(torch.cuda, "LongTensor", torch.LongTensor,
                        raising=False)
    monkeypatch.setattr(torch.cuda, "FloatTensor", torch.FloatTensor,
                        raising=False)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.syspath_prepend(reference_dir)
    for mod in ("darknet", "region_loss", "cfg", "utils"):
        sys.modules.pop(mod, None)
    import importlib
    ref_darknet = importlib.import_module("darknet")
    # standalone RegionLoss with the torch-0.4 `.data[0]` shimmed to .item()
    src = open(os.path.join(reference_dir, "region_loss.py")).read()
    src = src.replace(".data[0]", ".item()")
    # np.sum over a list of grad tensors calls Tensor.numpy() on modern
    # torch; Python sum builds the identical add chain and keeps the graph
    src = src.replace("np.sum(loss_xs)", "sum(loss_xs)")
    src = src.replace("np.sum(loss_ys)", "sum(loss_ys)")
    ref_rl = types.ModuleType("ref_region_loss")
    exec(compile(src, os.path.join(reference_dir, "region_loss.py"), "exec"),
         ref_rl.__dict__)
    yield torch, ref_darknet, ref_rl
    for mod in ("darknet", "region_loss", "cfg", "utils"):
        sys.modules.pop(mod, None)


def test_training_trajectory_matches_reference(reference_stack, tmp_path):
    torch, ref_darknet, ref_rl = reference_stack

    # reference Darknet requires [net] width/height and [region]
    # class/coord scale keys that the tiny cfg omits
    cfg_text = TINY_CFG.replace(
        "[net]", f"[net]\nwidth={IMG}\nheight={IMG}") \
        + "class_scale=1\ncoord_scale=1\n"
    cfgfile = str(tmp_path / "tiny.cfg")
    with open(cfgfile, "w") as f:
        f.write(cfg_text)

    spec = DarknetSpec(parse_cfg(cfgfile))
    params, stats = spec.init_params(jax.random.PRNGKey(3))
    wfile = str(tmp_path / "init.weights")
    save_weights(spec, params, stats, wfile, seen=0)

    # ---- reference trajectory --------------------------------------------
    model = ref_darknet.Darknet(cfgfile)
    model.load_weights(wfile)
    model.train()
    loss_mod = ref_rl.RegionLoss(num_keypoints=9, num_classes=1, anchors=[],
                                 num_anchors=1, pretrain_num_epochs=15)
    loss_mod.seen = 10 ** 6
    opt = torch.optim.SGD(model.parameters(), lr=LR / B, momentum=MOM,
                          weight_decay=DECAY * B)
    ref_losses = []
    for imgs, t in _batches():
        opt.zero_grad()
        out = model(torch.from_numpy(imgs.copy()))
        loss = loss_mod(out, torch.from_numpy(t.copy()), 100)
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    # ---- our trajectory ---------------------------------------------------
    state = init_train_state(jax.tree.map(jnp.asarray, params),
                             jax.tree.map(jnp.asarray, stats))
    step = make_train_step(spec, RegionLossConfig.single(),
                           weight_decay=DECAY * B, momentum=MOM,
                           compute_dtype=None, donate=False)
    our_losses = []
    for imgs, t in _batches():
        state, st = step(state, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), LR / B, 100)
        our_losses.append(float(st["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3,
                               err_msg=f"ours={our_losses}\nref={ref_losses}")
    # trajectories must actually move (not vacuous agreement at a fixpoint)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-3

    # final parameters agree too (conv_1: torch OIHW ↔ ours HWIO)
    tw = None
    for m in model.models:
        if isinstance(m, torch.nn.Sequential):
            tw = m[0].weight.detach().numpy()
            break
    ours_w = np.asarray(state.params["conv_1"]["w"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(ours_w, tw, rtol=5e-3, atol=1e-5)
