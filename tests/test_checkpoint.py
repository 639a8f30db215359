"""Orbax checkpointing: save/restore round-trip, retention, and driver
resume on the synthetic dataset; DP-mesh training through the driver."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from singleshotpose_tpu.checkpoint import OrbaxCheckpointer
from singleshotpose_tpu.config import parse_cfg
from singleshotpose_tpu.models.darknet import DarknetSpec
from singleshotpose_tpu.training import init_train_state

from test_drivers import TINY_CFG, _make_synthetic_linemod


@pytest.fixture(scope="module")
def tiny_spec(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "tiny.cfg"
    p.write_text(TINY_CFG)
    return DarknetSpec(parse_cfg(str(p)))


def test_orbax_roundtrip_and_retention(tiny_spec, tmp_path):
    params, bstats = tiny_spec.init_params(jax.random.PRNGKey(0))
    state = init_train_state(params, bstats)
    state = state._replace(seen=jnp.asarray(123, jnp.int32))

    ckpt = OrbaxCheckpointer(str(tmp_path / "ckpt"), max_to_keep=2)
    for step in (1, 2, 3):
        ckpt.save(step, state, wait=True)
    assert ckpt.latest_step() == 3

    restored, step = ckpt.restore()
    assert step == 3
    assert int(restored.seen) == 123
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), restored.params, state.params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), restored.momentum, state.momentum)
    ckpt.close()

    # retention: only 2 kept
    ckpt2 = OrbaxCheckpointer(str(tmp_path / "ckpt"), max_to_keep=2)
    with pytest.raises(Exception):
        ckpt2.restore(1)
    st2, _ = ckpt2.restore(2)
    assert int(st2.seen) == 123
    ckpt2.close()


def test_driver_resume_continues_from_checkpoint(tmp_path):
    from singleshotpose_tpu.drivers import TrainRunConfig, run_training
    datacfg, backup = _make_synthetic_linemod(tmp_path)
    cfgfile = tmp_path / "tiny.cfg"
    cfgfile.write_text(TINY_CFG)

    odir = str(tmp_path / "orbax")
    rc = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                        bg_dir="/nonexistent", log_every=100,
                        max_epochs_override=2, orbax_dir=odir,
                        orbax_every_epochs=1)
    rc.compute_dtype = None
    r1 = run_training(datacfg, str(cfgfile), None, 100, rc)
    seen1 = int(jax.device_get(r1["state"].seen))
    assert seen1 == 12   # 2 epochs × 3 batches × 2

    rc2 = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                         bg_dir="/nonexistent", log_every=100,
                         max_epochs_override=4, orbax_dir=odir,
                         orbax_every_epochs=100, resume=True)
    rc2.compute_dtype = None
    r2 = run_training(datacfg, str(cfgfile), None, 100, rc2)
    seen2 = int(jax.device_get(r2["state"].seen))
    # resumed at epoch 2 (seen=12 → init_epoch=2), ran epochs 2..3
    assert seen2 == 24
    # params actually advanced from the restored ones
    w1 = np.asarray(r1["state"].params["conv_1"]["w"])
    w2 = np.asarray(r2["state"].params["conv_1"]["w"])
    assert not np.allclose(w1, w2)


def test_driver_mesh_training(tmp_path):
    from singleshotpose_tpu.drivers import TrainRunConfig, run_training
    from singleshotpose_tpu.parallel.sharding import make_mesh
    datacfg, backup = _make_synthetic_linemod(tmp_path)
    cfgfile = tmp_path / "tiny.cfg"
    cfgfile.write_text(TINY_CFG)

    mesh = make_mesh(jax.devices()[:2], dp=2, mp=1)
    rc = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                        bg_dir="/nonexistent", log_every=100,
                        max_epochs_override=1, mesh=mesh)
    rc.compute_dtype = None
    r = run_training(datacfg, str(cfgfile), None, 100, rc)
    assert np.isfinite(r["history"]["training_losses"]).all()
    assert int(jax.device_get(r["state"].seen)) == 6
