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


def test_multi_driver_mesh_training(tmp_path):
    """Multi trainer on a 2-device DP mesh: sharded state + batches."""
    import jax
    import numpy as np
    from PIL import Image
    from singleshotpose_tpu.drivers import TrainRunConfig, run_training_multi
    from singleshotpose_tpu.parallel.sharding import make_mesh

    rng = np.random.RandomState(0)
    root = tmp_path / "LINEMOD" / "ape"
    for d in ("JPEGImages", "mask", "labels"):
        (root / d).mkdir(parents=True)
    paths = []
    for i in range(4):
        name = f"00{i:04d}"
        Image.fromarray(rng.randint(0, 255, (120, 160, 3), np.uint8)).save(
            root / "JPEGImages" / f"{name}.jpg")
        m = np.zeros((120, 160), np.uint8)
        m[30:90, 40:120] = 255
        Image.fromarray(m).save(root / "mask" / f"{name[2:]}.png")
        lab = np.zeros(21, np.float32)
        lab[1:19] = rng.uniform(0.3, 0.7, 18)
        lab[19:21] = [0.3, 0.4]
        np.savetxt(root / "labels" / f"{name}.txt", lab[None])
        paths.append(str(root / "JPEGImages" / f"{name}.jpg"))
    (root / "train.txt").write_text(
        "\n".join(f"LINEMOD/ape/JPEGImages/00{i:04d}.jpg"
                  for i in range(4)) + "\n")
    (tmp_path / "tr.txt").write_text("\n".join(paths) + "\n")
    (tmp_path / "occ.data").write_text(
        f"train = {tmp_path}/tr.txt\nbackup = {tmp_path}/backup\n"
        "name = occlusion\nwidth = 160\nheight = 120\n")

    cfg = tmp_path / "multi.cfg"
    from test_training import TINY_CFG
    cfg.write_text(TINY_CFG.replace("batch=4", "batch=2")
                   .replace("filters=20", "filters=44")
                   .replace("classes=1", "classes=3")
                   .replace("anchors =", "anchors = 1.5, 2.2, 3.1, 4.0")
                   .replace("num=1", "num=2"))

    import singleshotpose_tpu.data.synth_multi as sm
    orig = sm.ADD_OBJS
    sm.ADD_OBJS = dict(orig)
    sm.ADD_OBJS["ape"] = ()
    try:
        mesh = make_mesh(jax.devices()[:2], dp=2, mp=1)
        rc = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                            bg_dir="/nonexistent", log_every=100,
                            max_epochs_override=1, mesh=mesh)
        rc.compute_dtype = None
        r = run_training_multi(str(tmp_path / "occ.data"), str(cfg), None, 0,
                               None, str(tmp_path / "LINEMOD"), rc)
        assert np.isfinite(r["history"]["training_losses"]).all()
    finally:
        sm.ADD_OBJS = orig
