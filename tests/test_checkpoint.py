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


def _make_synthetic_multi(tmp_path, n=4, batch=2):
    """Synthetic multi-object set: LINEMOD-layout 'ape' frames + occlusion
    .data + a small 3-class multi cfg.  Returns (datacfg, cfgfile,
    linemod_root); callers must patch synth_multi.ADD_OBJS['ape'] = ()."""
    from PIL import Image
    rng = np.random.RandomState(0)
    root = tmp_path / "LINEMOD" / "ape"
    for d in ("JPEGImages", "mask", "labels"):
        (root / d).mkdir(parents=True)
    paths = []
    for i in range(n):
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
                  for i in range(n)) + "\n")
    (tmp_path / "tr.txt").write_text("\n".join(paths) + "\n")
    (tmp_path / "occ.data").write_text(
        f"train = {tmp_path}/tr.txt\nbackup = {tmp_path}/backup\n"
        "name = occlusion\nwidth = 160\nheight = 120\n")

    cfg = tmp_path / "multi.cfg"
    from test_training import TINY_CFG
    cfg.write_text(TINY_CFG.replace("batch=4", f"batch={batch}")
                   .replace("filters=20", "filters=44")
                   .replace("classes=1", "classes=3")
                   .replace("anchors =", "anchors = 1.5, 2.2, 3.1, 4.0")
                   .replace("num=1", "num=2"))
    return str(tmp_path / "occ.data"), str(cfg), str(tmp_path / "LINEMOD")


@pytest.fixture
def patched_add_objs():
    import singleshotpose_tpu.data.synth_multi as sm
    orig = sm.ADD_OBJS
    sm.ADD_OBJS = dict(orig)
    sm.ADD_OBJS["ape"] = ()
    yield
    sm.ADD_OBJS = orig


def test_offline_eval_from_orbax_matches_inmemory(tmp_path):
    """ssp valid --orbax_dir: restored-state eval == in-memory eval (the
    offline path for multi-host runs, which skip in-training eval)."""
    from singleshotpose_tpu.cli import main as cli_main
    from singleshotpose_tpu.drivers import (TrainRunConfig, run_training,
                                            run_validation)
    datacfg, backup = _make_synthetic_linemod(tmp_path)
    cfgfile = tmp_path / "tiny.cfg"
    cfgfile.write_text(TINY_CFG)
    odir = str(tmp_path / "orbax")
    rc = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                        bg_dir="/nonexistent", log_every=100,
                        max_epochs_override=1, orbax_dir=odir,
                        orbax_every_epochs=1)
    rc.compute_dtype = None
    r = run_training(datacfg, str(cfgfile), None, 100, rc)

    s_mem = run_validation(datacfg, str(cfgfile), params=r["state"].params,
                           batch_stats=r["state"].batch_stats, batch_size=3,
                           num_workers=0, compute_dtype=None, verbose=False)
    restored, _ = OrbaxCheckpointer(odir).restore()
    s_off = run_validation(datacfg, str(cfgfile), params=restored.params,
                           batch_stats=restored.batch_stats, batch_size=3,
                           num_workers=0, compute_dtype=None, verbose=False)
    for k in s_mem:
        np.testing.assert_allclose(s_off[k], s_mem[k], rtol=1e-6,
                                   err_msg=k)
    # the CLI plumbing end-to-end
    assert cli_main(["valid", "--datacfg", datacfg,
                     "--modelcfg", str(cfgfile), "--orbax_dir", odir]) == 0


def test_multi_driver_mesh_training(tmp_path, patched_add_objs):
    """Multi trainer on a 2-device DP mesh: sharded state + batches."""
    from singleshotpose_tpu.drivers import TrainRunConfig, run_training_multi
    from singleshotpose_tpu.parallel.sharding import make_mesh

    datacfg, cfg, lm_root = _make_synthetic_multi(tmp_path)
    mesh = make_mesh(jax.devices()[:2], dp=2, mp=1)
    rc = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                        bg_dir="/nonexistent", log_every=100,
                        max_epochs_override=1, mesh=mesh)
    rc.compute_dtype = None
    r = run_training_multi(datacfg, cfg, None, 0, None, lm_root, rc)
    assert np.isfinite(r["history"]["training_losses"]).all()


def test_multi_driver_resume(tmp_path, patched_add_objs):
    """Multi trainer Orbax resume continues from the restored seen counter
    (parity with the single trainer's resume semantics)."""
    from singleshotpose_tpu.drivers import TrainRunConfig, run_training_multi

    datacfg, cfg, lm_root = _make_synthetic_multi(tmp_path)
    odir = str(tmp_path / "orbax")
    rc = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                        bg_dir="/nonexistent", log_every=100,
                        max_epochs_override=1, orbax_dir=odir,
                        orbax_every_epochs=1)
    rc.compute_dtype = None
    r1 = run_training_multi(datacfg, cfg, None, 0, None, lm_root, rc)
    seen1 = int(jax.device_get(r1["state"].seen))
    assert seen1 == 4   # 1 epoch × 2 batches × 2

    rc2 = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                         bg_dir="/nonexistent", log_every=100,
                         max_epochs_override=2, orbax_dir=odir,
                         orbax_every_epochs=100, resume=True)
    rc2.compute_dtype = None
    r2 = run_training_multi(datacfg, cfg, None, 0, None, lm_root, rc2)
    assert int(jax.device_get(r2["state"].seen)) == 8
    w1 = np.asarray(r1["state"].params["conv_1"]["w"])
    w2 = np.asarray(r2["state"].params["conv_1"]["w"])
    assert not np.allclose(w1, w2)


def test_cli_train_multi_flags(tmp_path, patched_add_objs):
    """train-multi CLI exposes the full knob set (--dp/--orbax_dir/...)."""
    from singleshotpose_tpu.cli import main as cli_main

    datacfg, cfg, lm_root = _make_synthetic_multi(tmp_path)
    rv = cli_main(["train-multi", "--datacfg", datacfg, "--modelcfg", cfg,
                   "--initweightfile", "", "--linemod_root", lm_root,
                   "--max_epochs", "1", "--bg_dir", "/nonexistent",
                   "--dp", "2", "--orbax_dir", str(tmp_path / "orbax"),
                   "--cache_decoded", "--eval_datacfgs"])
    assert rv == 0
    assert (tmp_path / "orbax").exists()


def test_multihost_local_shard(tmp_path, monkeypatch):
    """Per-process dataset shard + local batch division (simulated 2-host)."""
    from singleshotpose_tpu.drivers import _multihost_local_shard
    from singleshotpose_tpu.parallel.sharding import make_mesh

    class FakeDS:
        lines = [f"img{i}.jpg" for i in range(5)]
        def __len__(self):
            return len(self.lines)

    mesh = make_mesh(jax.devices()[:2], dp=2, mp=1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    ds = FakeDS()
    lb, seen = _multihost_local_shard(ds, 4, 8, mesh)
    assert lb == 2 and seen == 4
    assert ds.lines == ["img2.jpg", "img3.jpg"]   # host 1's contiguous shard

    with pytest.raises(ValueError):
        _multihost_local_shard(FakeDS(), 5, 0, mesh)

    # single-host / no-mesh: no-op
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    ds2 = FakeDS()
    assert _multihost_local_shard(ds2, 4, 8, mesh) == (4, 8)
    assert len(ds2.lines) == 5
    assert _multihost_local_shard(FakeDS(), 4, 8, None) == (4, 8)
