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

N_STEPS = 50
B, IMG = 2, 128
LR, MOM, DECAY = 0.001, 0.9, 0.0005
# multi-scale width switch mid-trajectory: the reference re-draws the input
# size from 32-px multiples as `seen` grows (``dataset.py:66-90``); crossing
# a bucket boundary inside the A/B proves the step handles a shape change
# with state (momentum, BN stats) carried across it
WIDTHS = [IMG] * (N_STEPS // 2) + [160] * (N_STEPS - N_STEPS // 2)


def _batches(seed=0, n_steps=N_STEPS, widths=None, num_gt=1,
             num_classes=1):
    """Identical per-step (images NCHW f32, padded 21-stride targets)."""
    rng = np.random.RandomState(seed)
    widths = widths if widths is not None else [IMG] * n_steps
    out = []
    for s in range(n_steps):
        w = widths[s]
        imgs = rng.rand(B, 3, w, w).astype(np.float32)
        t = np.zeros((B, 50 * 21), np.float32)
        tt = t.reshape(B, 50, 21)
        for b in range(B):
            # single-object path keeps one GT per image: the reference
            # pass-1 torch.max relies on legacy same-numel semantics that
            # raise on modern torch with >1 (the multi path supports many)
            for g in range(num_gt):
                tt[b, g, 0] = (b + g) % num_classes
                tt[b, g, 1:19] = rng.uniform(0.15, 0.85, 18)
                tt[b, g, 19:21] = [0.25 + 0.2 * g, 0.35 + 0.15 * g]
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
    for imgs, t in _batches(widths=WIDTHS):
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
    for imgs, t in _batches(widths=WIDTHS):
        state, st = step(state, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), LR / B, 100)
        our_losses.append(float(st["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=4e-3,
                               err_msg=f"ours={our_losses}\nref={ref_losses}")
    # trajectories must actually move in BOTH width regimes (not vacuous
    # agreement at a fixpoint), and the switch itself must be crossed
    half = N_STEPS // 2
    assert abs(ref_losses[0] - ref_losses[half - 1]) > 1e-3
    assert abs(ref_losses[half] - ref_losses[-1]) > 1e-3

    # final parameters agree too (conv_1: torch OIHW ↔ ours HWIO)
    tw = None
    for m in model.models:
        if isinstance(m, torch.nn.Sequential):
            tw = m[0].weight.detach().numpy()
            break
    ours_w = np.asarray(state.params["conv_1"]["w"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(ours_w, tw, rtol=5e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# multi-object trajectory (anchors, IoU anchor match, CE class loss)
# ---------------------------------------------------------------------------

N_STEPS_MULTI = 24
ANCHORS = [1.5, 2.2, 3.1, 4.0]
N_CLASSES, N_ANCH = 3, 2


@pytest.fixture
def reference_multi_stack(reference_dir, monkeypatch, tmp_path):
    """(torch, ref darknet_multi, patched ref region_loss_multi module).

    The reference multi loss source is patched for modern torch
    (``.data[0]`` → ``.item()``, ``np.sum`` over grad tensors → ``sum``)
    AND for its documented target-assignment bug: ``pred_box`` is read with
    ``best_n = -1`` BEFORE the anchor is chosen
    (``region_loss_multi.py:51,63``), so every rescoring confidence comes
    from the previous image's last anchor.  Our implementation uses the
    chosen anchor's cell (SURVEY §7 "bugs to NOT copy"); the A/B therefore
    runs against the reference with the read moved after anchor selection —
    the unambiguous intended semantics.
    """
    torch = pytest.importorskip("torch")
    monkeypatch.setattr(torch.cuda, "LongTensor", torch.LongTensor,
                        raising=False)
    monkeypatch.setattr(torch.cuda, "FloatTensor", torch.FloatTensor,
                        raising=False)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    multi_dir = os.path.join(reference_dir, "multi_obj_pose_estimation")
    monkeypatch.syspath_prepend(reference_dir)   # cfg.py lives at top level
    monkeypatch.syspath_prepend(multi_dir)
    mods = ("darknet_multi", "region_loss_multi", "cfg", "utils",
            "utils_multi", "darknet", "region_loss")
    for mod in mods:
        sys.modules.pop(mod, None)
    import importlib
    ref_darknet = importlib.import_module("darknet_multi")

    src = open(os.path.join(multi_dir, "region_loss_multi.py")).read()
    src = src.replace(".data[0]", ".item()")
    src = src.replace("np.sum(loss_xs)", "sum(loss_xs)")
    src = src.replace("np.sum(loss_ys)", "sum(loss_ys)")
    # the best_n=-1 pre-read bug: move the rescoring read after the anchor
    # loop (the two patched fragments must both exist in the source)
    pre_read = ("            pred_box = pred_corners[b*nAnchors+best_n"
                "*nPixels+gj0*nW+gi0]\n"
                "            conf = corner_confidence(gt_box, pred_box) \n")
    assert pre_read in src
    src = src.replace(pre_read, "")
    write_site = "            coord_mask[b][best_n][gj0][gi0] = 1\n"
    assert write_site in src
    src = src.replace(
        write_site,
        "            pred_box = pred_corners[b*nAnchors+best_n*nPixels"
        "+gj0*nW+gi0]\n"
        "            conf = corner_confidence(gt_box, pred_box)\n"
        + write_site)
    ref_rlm = types.ModuleType("ref_region_loss_multi")
    exec(compile(src, os.path.join(multi_dir, "region_loss_multi.py"),
                 "exec"), ref_rlm.__dict__)
    yield torch, ref_darknet, ref_rlm
    for mod in mods:
        sys.modules.pop(mod, None)


def _tiny_multi_cfg(tmp_path):
    cfg_text = TINY_CFG.replace(
        "[net]", f"[net]\nwidth={IMG}\nheight={IMG}") \
        .replace("filters=20", f"filters={N_ANCH * (19 + N_CLASSES)}") \
        .replace("classes=1", f"classes={N_CLASSES}") \
        .replace("anchors =", "anchors = " + ", ".join(map(str, ANCHORS))) \
        .replace("num=1", f"num={N_ANCH}") \
        + "class_scale=1\ncoord_scale=1\n"
    cfgfile = str(tmp_path / "tiny_multi.cfg")
    with open(cfgfile, "w") as f:
        f.write(cfg_text)
    return cfgfile


def test_multi_trajectory_matches_reference(reference_multi_stack, tmp_path):
    """N full SGD steps of the MULTI-object loss (2 anchors chosen by 2D-
    extent IoU, 3 classes, CE class loss, multiple GTs per image) A/B vs
    the reference torch stack (``region_loss_multi.py``, intended-semantics
    patch per the fixture)."""
    torch, ref_darknet, ref_rlm = reference_multi_stack
    cfgfile = _tiny_multi_cfg(tmp_path)

    spec = DarknetSpec(parse_cfg(cfgfile))
    params, stats = spec.init_params(jax.random.PRNGKey(4))
    wfile = str(tmp_path / "init_multi.weights")
    save_weights(spec, params, stats, wfile, seen=0)

    batches = _batches(seed=9, n_steps=N_STEPS_MULTI, num_gt=3,
                       num_classes=N_CLASSES)

    # ---- reference trajectory --------------------------------------------
    model = ref_darknet.Darknet(cfgfile)
    model.load_weights(wfile)
    model.train()
    loss_mod = ref_rlm.RegionLoss(num_keypoints=9, num_classes=N_CLASSES,
                                  anchors=ANCHORS, num_anchors=N_ANCH,
                                  pretrain_num_epochs=0)
    loss_mod.seen = 10 ** 6
    opt = torch.optim.SGD(model.parameters(), lr=LR / B, momentum=MOM,
                          weight_decay=DECAY * B)
    ref_losses = []
    for imgs, t in batches:
        opt.zero_grad()
        out = model(torch.from_numpy(imgs.copy()))
        loss = loss_mod(out, torch.from_numpy(t.copy()), 100)
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    # ---- our trajectory ---------------------------------------------------
    state = init_train_state(jax.tree.map(jnp.asarray, params),
                             jax.tree.map(jnp.asarray, stats))
    cfg = RegionLossConfig.multi(anchors=tuple(ANCHORS),
                                 num_classes=N_CLASSES, num_anchors=N_ANCH)
    step = make_train_step(spec, cfg, weight_decay=DECAY * B, momentum=MOM,
                           compute_dtype=None, donate=False)
    our_losses = []
    for imgs, t in batches:
        state, st = step(state, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), LR / B, 100)
        our_losses.append(float(st["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=4e-3,
                               err_msg=f"ours={our_losses}\nref={ref_losses}")
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-3

    tw = None
    for m in model.models:
        if isinstance(m, torch.nn.Sequential):
            tw = m[0].weight.detach().numpy()
            break
    ours_w = np.asarray(state.params["conv_1"]["w"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(ours_w, tw, rtol=5e-3, atol=1e-5)
