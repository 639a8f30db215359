"""Train-step tests: SGD semantics vs torch, LR schedule vs the reference
algorithm, and a full fused step on an 8-device virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from singleshotpose_tpu.config import parse_cfg
from singleshotpose_tpu.models.darknet import DarknetSpec
from singleshotpose_tpu.ops.losses import RegionLossConfig
from singleshotpose_tpu.parallel.sharding import (
    batch_sharding, batch_stats_shardings, make_mesh, param_shardings,
    shard_host_batch)
from singleshotpose_tpu.training import (
    TrainState, init_train_state, make_train_step, schedule_lr, sgd_apply)

TINY_CFG = """
[net]
batch=4
channels=3
num_keypoints=9
learning_rate=0.001
momentum=0.9
decay=0.0005

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=0
filters=20
size=1
stride=1
pad=1
activation=linear

[region]
anchors =
classes=1
coords=18
num=1
object_scale=5
noobject_scale=0.1
thresh = 0.6
"""


@pytest.fixture(scope="module")
def tiny_spec(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "tiny.cfg"
    p.write_text(TINY_CFG)
    return DarknetSpec(parse_cfg(str(p)))


def _tiny_target(B, K=9):
    """One GT in slot 0 per image, rest zero (break semantics)."""
    t = np.zeros((B, 50 * (2 * K + 3)), np.float32)
    rng = np.random.RandomState(0)
    for b in range(B):
        t[b, 0] = 0.0                      # class
        t[b, 1:2 * K + 1] = rng.uniform(0.2, 0.8, 2 * K)
        t[b, 2 * K + 1:2 * K + 3] = [0.3, 0.4]
    return t


def test_schedule_lr_matches_reference_algorithm():
    steps = [-1.0, 100.0, 200.0]
    scales = [0.1, 10.0, 0.1]
    # batch -1 passed? batch starts at 0: first step -1 → lr*=0.1, then 100 not
    # reached → stop.
    assert np.isclose(schedule_lr(1.0, 0, steps, scales), 0.1)
    # exactly at a step: apply its scale then break.
    assert np.isclose(schedule_lr(1.0, 100, steps, scales), 0.1 * 10.0)
    # beyond all steps: all scales applied.
    assert np.isclose(schedule_lr(1.0, 500, steps, scales), 0.1 * 10.0 * 0.1)
    # scales shorter than steps → trailing scale defaults to 1.
    assert np.isclose(schedule_lr(1.0, 500, [0.0, 10.0], [0.5]), 0.5)


def test_sgd_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    w0 = rng.randn(4, 3).astype(np.float32)
    lr, wd, mom = 0.01, 0.02, 0.9

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tw], lr=lr, momentum=mom, weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    momentum = {"w": jnp.zeros_like(params["w"])}

    for i in range(4):
        g = rng.randn(4, 3).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()
        params, momentum = sgd_apply(params, {"w": jnp.asarray(g)}, momentum,
                                     lr, wd, mom)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_train_step_runs_and_learns(tiny_spec):
    params, bstats = tiny_spec.init_params(jax.random.PRNGKey(0))
    state = init_train_state(params, bstats)
    cfg = RegionLossConfig.single()
    step = make_train_step(tiny_spec, cfg, weight_decay=0.0005 * 4,
                           momentum=0.9, compute_dtype=None, donate=False)
    imgs = jnp.asarray(np.random.RandomState(2).rand(4, 64, 64, 3),
                       jnp.float32)
    tgt = jnp.asarray(_tiny_target(4))
    losses = []
    for i in range(5):
        state, stats = step(state, imgs, tgt, 0.001 / 4, 100)
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.seen) == 20
    assert np.isfinite(losses).all()


def test_pretrain_gate_drops_conf_loss(tiny_spec):
    params, bstats = tiny_spec.init_params(jax.random.PRNGKey(0))
    state = init_train_state(params, bstats)
    cfg = RegionLossConfig.single(pretrain_num_epochs=15)
    step = make_train_step(tiny_spec, cfg, weight_decay=0.0, momentum=0.0,
                           compute_dtype=None, donate=False)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    tgt = jnp.asarray(_tiny_target(2))
    _, s_pre = step(state, imgs, tgt, 0.0, 10)    # epoch <= 15: gated
    _, s_post = step(state, imgs, tgt, 0.0, 16)   # epoch > 15: conf included
    assert np.isclose(float(s_pre["loss"]),
                      float(s_pre["loss_x"] + s_pre["loss_y"]), rtol=1e-5)
    assert float(s_post["loss"]) > float(s_pre["loss"])


def test_train_step_on_8_device_mesh(tiny_spec):
    mesh = make_mesh(dp=4, mp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    params, bstats = tiny_spec.init_params(jax.random.PRNGKey(0))
    ps = param_shardings(tiny_spec, mesh)
    bs = batch_stats_shardings(tiny_spec, mesh)
    params = jax.tree.map(jax.device_put, params, ps)
    bstats = jax.tree.map(jax.device_put, bstats, bs)
    momentum = jax.tree.map(jnp.zeros_like, params)
    state = TrainState(params, bstats, momentum, jnp.asarray(0, jnp.int32))

    cfg = RegionLossConfig.single()
    step = make_train_step(tiny_spec, cfg, weight_decay=0.002, momentum=0.9,
                           compute_dtype=None, donate=False)
    imgs, tgt = shard_host_batch(
        mesh, np.random.RandomState(3).rand(8, 64, 64, 3).astype(np.float32),
        _tiny_target(8))
    state2, stats = step(state, imgs, tgt, 0.00025, 100)
    assert np.isfinite(float(stats["loss"]))

    # sharded result == single-device result (SPMD correctness)
    params1, bstats1 = tiny_spec.init_params(jax.random.PRNGKey(0))
    state1 = init_train_state(params1, bstats1)
    state1b, stats1 = step(state1, jnp.asarray(np.asarray(imgs)),
                           jnp.asarray(np.asarray(tgt)), 0.00025, 100)
    np.testing.assert_allclose(float(stats["loss"]), float(stats1["loss"]),
                               rtol=1e-4)
    w_sharded = np.asarray(state2.params["conv_1"]["w"])
    w_single = np.asarray(state1b.params["conv_1"]["w"])
    np.testing.assert_allclose(w_sharded, w_single, rtol=1e-4, atol=1e-6)


def test_train_step_on_8_device_mesh_mp4(tiny_spec):
    """Tensor-parallel degree 4 (data=2 x model=4): the output-channel
    sharding and GSPMD collectives must hold at higher mp than the default
    2 — SPMD result == single-device result."""
    mesh = make_mesh(dp=2, mp=4)
    assert mesh.shape == {"data": 2, "model": 4}
    params, bstats = tiny_spec.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(jax.device_put, params,
                          param_shardings(tiny_spec, mesh))
    bstats = jax.tree.map(jax.device_put, bstats,
                          batch_stats_shardings(tiny_spec, mesh))
    state = TrainState(params, jax.tree.map(jnp.asarray, bstats),
                       jax.tree.map(jnp.zeros_like, params),
                       jnp.asarray(0, jnp.int32))
    cfg = RegionLossConfig.single()
    step = make_train_step(tiny_spec, cfg, weight_decay=0.002, momentum=0.9,
                           compute_dtype=None, donate=False)
    imgs, tgt = shard_host_batch(
        mesh, np.random.RandomState(5).rand(8, 64, 64, 3).astype(np.float32),
        _tiny_target(8))
    state2, stats = step(state, imgs, tgt, 0.00025, 100)

    params1, bstats1 = tiny_spec.init_params(jax.random.PRNGKey(0))
    state1 = init_train_state(params1, bstats1)
    state1b, stats1 = step(state1, jnp.asarray(np.asarray(imgs)),
                           jnp.asarray(np.asarray(tgt)), 0.00025, 100)
    np.testing.assert_allclose(float(stats["loss"]), float(stats1["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state2.params["conv_1"]["w"]),
                               np.asarray(state1b.params["conv_1"]["w"]),
                               rtol=1e-4, atol=1e-6)


def test_sharded_state_does_not_recompile(tiny_spec):
    """shard_train_state places EVERY leaf (incl. momentum + seen), so the
    step's output shardings equal its input shardings and a second call hits
    the executable cache.  A mixed state (default-placed seen/momentum next
    to NamedSharding params) comes back fully NamedSharding from call 1 and
    forces a full recompile on call 2 — the pathology BENCH_r03 timed as a
    196.5 ms 'step' (real steady state: ~10.6 ms, same as unmeshed)."""
    from functools import partial

    from singleshotpose_tpu.parallel.sharding import shard_train_state

    mesh = make_mesh(dp=4, mp=2)
    params, bstats = tiny_spec.init_params(jax.random.PRNGKey(0))
    cfg = RegionLossConfig.single()
    raw = make_train_step(tiny_spec, cfg, weight_decay=0.002, momentum=0.9,
                          compute_dtype=None, donate=False,
                          jit_compile=False)
    step = partial(jax.jit, donate_argnums=(0,))(
        lambda st, im, tg: raw(st, im, tg, jnp.float32(0.001), 100))
    imgs, tgt = shard_host_batch(
        mesh, np.random.RandomState(7).rand(8, 64, 64, 3).astype(np.float32),
        _tiny_target(8))

    # the fixed path: every leaf sharded -> exactly one executable
    state = shard_train_state(tiny_spec, mesh,
                              init_train_state(params, bstats))
    for leaf in jax.tree.leaves(state):
        assert isinstance(leaf.sharding, jax.sharding.NamedSharding)
    state, _ = step(state, imgs, tgt)
    state, _ = step(state, imgs, tgt)
    assert step._cache_size() == 1

    # the regression shape: mixed state recompiles on the second call
    mixed = init_train_state(*tiny_spec.init_params(jax.random.PRNGKey(0)))
    mixed = mixed._replace(
        params=jax.tree.map(jax.device_put, mixed.params,
                            param_shardings(tiny_spec, mesh)),
        batch_stats=jax.tree.map(jax.device_put, mixed.batch_stats,
                                 batch_stats_shardings(tiny_spec, mesh)))
    step2 = partial(jax.jit, donate_argnums=(0,))(
        lambda st, im, tg: raw(st, im, tg, jnp.float32(0.001), 100))
    mixed, _ = step2(mixed, imgs, tgt)
    mixed, _ = step2(mixed, imgs, tgt)
    assert step2._cache_size() == 2
