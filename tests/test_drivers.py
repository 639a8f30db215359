"""Integration: full train→eval→checkpoint cycle on a synthetic LINEMOD-format
dataset with a tiny net (CPU backend, minutes not hours)."""

import os

import numpy as np
import pytest

import jax

from singleshotpose_tpu.cli import main as cli_main
from singleshotpose_tpu.config import parse_cfg
from singleshotpose_tpu.drivers import (TrainRunConfig, run_training,
                                        run_validation)
from singleshotpose_tpu.models.darknet import DarknetSpec


def _make_synthetic_linemod(tmp_path, n=6):
    """Images with known projected keypoints + masks + labels + data cfg."""
    from PIL import Image
    rng = np.random.RandomState(0)
    root = tmp_path / "obj"
    for d in ("JPEGImages", "mask", "labels"):
        (root / d).mkdir(parents=True)
    K = np.array([[572.4114, 0, 325.2611], [0, 573.5704, 242.0489],
                  [0, 0, 1]], np.float32)
    pts3d = np.array([[0, 0, 0]] + [[sx * .03, sy * .02, sz * .025]
                     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                     np.float32)
    paths = []
    for i in range(n):
        w = rng.randn(3) * 0.3
        th = np.linalg.norm(w)
        Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                       [-w[1], w[0], 0]])
        R = np.eye(3) + np.sin(th) / th * Kx + \
            (1 - np.cos(th)) / th ** 2 * Kx @ Kx
        t = np.array([rng.uniform(-.05, .05), rng.uniform(-.05, .05), 0.7])
        cam = pts3d @ R.T + t
        pix = cam @ K.T
        pix = pix[:, :2] / pix[:, 2:3]
        img = rng.randint(0, 255, (480, 640, 3), np.uint8)
        name = f"00{i:04d}"
        Image.fromarray(img).save(root / "JPEGImages" / f"{name}.jpg")
        m = np.zeros((480, 640), np.uint8)
        m[100:300, 200:400] = 255
        Image.fromarray(m).save(root / "mask" / f"{name[2:]}.png")
        lab = np.zeros(21, np.float32)
        lab[1:19:2] = pix[:, 0] / 640.0
        lab[2:19:2] = pix[:, 1] / 480.0
        lab[19:21] = [np.ptp(pix[:, 0]) / 640.0, np.ptp(pix[:, 1]) / 480.0]
        np.savetxt(root / "labels" / f"{name}.txt", lab[None])
        paths.append(str(root / "JPEGImages" / f"{name}.jpg"))
    (tmp_path / "train.txt").write_text("\n".join(paths) + "\n")

    # ply mesh (ascii) spanning the same box
    verts = pts3d[1:]
    ply = ["ply", "format ascii 1.0", f"element vertex {len(verts)}",
           "property float x", "property float y", "property float z",
           "element face 0", "property list uchar int vertex_indices",
           "end_header"]
    ply += [f"{v[0]} {v[1]} {v[2]}" for v in verts]
    (tmp_path / "obj.ply").write_text("\n".join(ply) + "\n")

    backup = tmp_path / "backup"
    data = (f"train = {tmp_path}/train.txt\n"
            f"valid = {tmp_path}/train.txt\n"
            f"backup = {backup}\n"
            f"mesh = {tmp_path}/obj.ply\n"
            "name = synth\ndiam = 0.0781\ngpus = 0\nnum_workers = 2\n"
            "width = 640\nheight = 480\n"
            "fx = 572.4114\nfy = 573.5704\nu0 = 325.2611\nv0 = 242.0489\n")
    (tmp_path / "synth.data").write_text(data)
    return str(tmp_path / "synth.data"), str(backup)


TINY_CFG = """
[net]
batch=2
channels=3
num_keypoints=9
learning_rate=0.001
momentum=0.9
decay=0.0005
steps=-1
scales=0.1
max_epochs=2
test_width=128
test_height=128
conf_thresh=0.1

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[maxpool]
size=2
stride=2

[maxpool]
size=2
stride=2

[maxpool]
size=2
stride=2

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
def synth(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("synth")
    datacfg, backup = _make_synthetic_linemod(tmp)
    cfgfile = tmp / "tiny.cfg"
    cfgfile.write_text(TINY_CFG)
    return datacfg, str(cfgfile), backup


def test_train_eval_checkpoint_cycle(synth):
    datacfg, cfgfile, backup = synth
    rc = TrainRunConfig(eval_every=1, eval_after=0, num_workers=2,
                        eval_batch_size=3, bg_dir="/nonexistent",
                        log_every=2, max_epochs_override=2)
    rc.compute_dtype = None
    result = run_training(datacfg, cfgfile, None, 100, rc)

    hist = result["history"]
    assert len(hist["training_losses"]) == 6  # 3 batches × 2 epochs
    assert np.isfinite(hist["training_losses"]).all()
    # epoch 1 triggered eval (1 % 1 == 0, 1 > 0) → checkpoint + costs
    assert os.path.exists(os.path.join(backup, "model.weights"))
    assert os.path.exists(os.path.join(backup, "costs.npz"))
    assert np.isfinite(result["best_acc"])

    # reload the darknet-format checkpoint and run standalone validation
    summary = run_validation(datacfg, cfgfile,
                             os.path.join(backup, "model.weights"),
                             batch_size=3, num_workers=0,
                             compute_dtype=None, verbose=False)
    assert summary["n_samples"] == 6
    assert np.isfinite(summary["mean_err_2d"])


def test_precompile_buckets_runs_all_widths(synth, monkeypatch, capsys):
    """precompile_buckets compiles every schedule width before epoch 0 and
    leaves the training result intact (throwaway warm state, real state
    untouched)."""
    import singleshotpose_tpu.drivers as D
    from singleshotpose_tpu.data.pipeline import MultiScaleSchedule

    datacfg, cfgfile, backup = synth
    tiny_sched = MultiScaleSchedule(((10, 4, 0), (0, 5, 0)))  # 128, 160 px
    monkeypatch.setattr(D, "SINGLE_SCHEDULE", tiny_sched)

    rc = TrainRunConfig(eval_every=100, eval_after=100, num_workers=0,
                        bg_dir="/nonexistent", log_every=100,
                        max_epochs_override=1, precompile_buckets=True)
    rc.compute_dtype = None
    result = run_training(datacfg, cfgfile, None, 100, rc)
    out = capsys.readouterr().out
    assert "precompiled bucket 128px" in out
    assert "precompiled bucket 160px" in out
    assert np.isfinite(result["history"]["training_losses"]).all()
    # warmup must not advance the real state's sample counter
    nsteps = len(result["history"]["training_losses"])
    assert int(jax.device_get(result["state"].seen)) == 2 * nsteps


def test_cli_print_cfg(synth, capsys):
    _, cfgfile, _ = synth
    assert cli_main(["print-cfg", cfgfile]) == 0
    out = capsys.readouterr().out
    assert "conv" in out and "max" in out


def test_cli_unknown_command(capsys):
    assert cli_main(["frobnicate"]) == 2


def test_sharded_eval_matches_single_device(synth):
    """run_validation over an 8-device ("data","model") mesh == single-device
    (f32 compute; batch 4 over dp=4 forces a zero-padded ragged tail on the
    6-image set)."""
    from singleshotpose_tpu.parallel.sharding import make_mesh

    datacfg, cfgfile, _ = synth
    spec = DarknetSpec(parse_cfg(cfgfile))
    params, bstats = spec.init_params(jax.random.PRNGKey(5))

    kw = dict(params=params, batch_stats=bstats, batch_size=4,
              num_workers=0, compute_dtype=None, verbose=False)
    base = run_validation(datacfg, spec, **kw)
    mesh = make_mesh(jax.devices()[:8], mp=2)      # dp=4, mp=2
    sharded = run_validation(datacfg, spec, mesh=mesh, **kw)

    assert sharded["n_samples"] == base["n_samples"] == 6
    for k in base:
        np.testing.assert_allclose(sharded[k], base[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)


def test_sharded_eval_quantized(synth):
    """int8 serving under a mesh: params replicate, batch shards; metrics
    finite and close to the unsharded quantized run."""
    from singleshotpose_tpu.parallel.sharding import make_mesh

    datacfg, cfgfile, _ = synth
    spec = DarknetSpec(parse_cfg(cfgfile))
    params, bstats = spec.init_params(jax.random.PRNGKey(5))

    kw = dict(params=params, batch_stats=bstats, batch_size=6,
              num_workers=0, compute_dtype=None, verbose=False,
              quantize=True)
    base = run_validation(datacfg, spec, **kw)
    mesh = make_mesh(jax.devices()[:4], mp=1)      # pure DP
    sharded = run_validation(datacfg, spec, mesh=mesh, **kw)
    assert sharded["n_samples"] == 6
    for k in base:
        np.testing.assert_allclose(sharded[k], base[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)


def test_quantize_cli_artifact_roundtrip(synth, tmp_path, capsys):
    """ssp quantize writes an int8 .npz; ssp valid --quantize <npz> serves it
    and matches first-batch-calibrated quantized eval."""
    from singleshotpose_tpu.weights import save_weights

    datacfg, cfgfile, _ = synth
    spec = DarknetSpec(parse_cfg(cfgfile))
    params, bstats = spec.init_params(jax.random.PRNGKey(9))
    wfile = str(tmp_path / "m.weights")
    save_weights(spec, params, bstats, wfile, seen=0)

    qnpz = str(tmp_path / "q.npz")
    assert cli_main(["quantize", "--datacfg", datacfg, "--modelcfg", cfgfile,
                     "--weightfile", wfile, "--out", qnpz,
                     "--calib_images", "6"]) == 0
    out = capsys.readouterr().out
    assert "quantized 1/2 conv layers" in out     # head conv skipped
    assert os.path.exists(qnpz)

    live = run_validation(datacfg, cfgfile, wfile, batch_size=6,
                          num_workers=0, compute_dtype=None, verbose=False,
                          quantize=True)
    # the npz IS the serving artifact: no weightfile passed at all
    from_npz = run_validation(datacfg, cfgfile, None, batch_size=6,
                              num_workers=0, compute_dtype=None,
                              verbose=False, quantize=qnpz)
    assert from_npz["n_samples"] == 6
    for k in live:
        np.testing.assert_allclose(from_npz[k], live[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_eval_bank_matches_rgb_and_caches(synth, monkeypatch):
    """transfer="bank" (HBM-resident split, data/eval_bank.py) reproduces the
    rgb path: the bank stores the exact u8 pixels rgb would ship (only the
    padded tail batch runs a different-shaped executable, so floats can
    differ at rounding level).  The second call must reuse the cached bank
    instead of re-decoding."""
    import singleshotpose_tpu.data.eval_bank as EB

    datacfg, cfgfile, _ = synth
    spec = DarknetSpec(parse_cfg(cfgfile))
    params, bstats = spec.init_params(jax.random.PRNGKey(5))
    kw = dict(params=params, batch_stats=bstats, batch_size=4,
              num_workers=0, compute_dtype=None, verbose=False)

    EB.clear_cache()
    builds = []
    real_build = EB.build_eval_bank
    monkeypatch.setattr(EB, "build_eval_bank",
                        lambda *a, **k: builds.append(1) or real_build(*a, **k))

    base = run_validation(datacfg, spec, transfer="rgb", **kw)
    banked = run_validation(datacfg, spec, transfer="bank", **kw)
    assert banked["n_samples"] == base["n_samples"] == 6
    for k in base:
        np.testing.assert_allclose(banked[k], base[k], rtol=1e-6, atol=1e-5,
                                   err_msg=k)

    banked2 = run_validation(datacfg, spec, transfer="bank", **kw)
    assert len(builds) == 1            # LRU hit: split decoded exactly once
    for k in base:
        np.testing.assert_allclose(banked2[k], banked[k], rtol=0, atol=0,
                                   err_msg=k)
    EB.clear_cache()


def test_eval_bank_sharded_matches_single_device(synth):
    """transfer="bank" under an 8-device ("data","model") mesh: the bank
    places batches sharded over the data axis (P(None, "data")) and matches
    the unsharded bank run (batch 4 over dp=4; 6 frames pad to 2 full
    batches inside the bank)."""
    import singleshotpose_tpu.data.eval_bank as EB
    from singleshotpose_tpu.parallel.sharding import make_mesh

    datacfg, cfgfile, _ = synth
    spec = DarknetSpec(parse_cfg(cfgfile))
    params, bstats = spec.init_params(jax.random.PRNGKey(5))
    kw = dict(params=params, batch_stats=bstats, batch_size=4,
              num_workers=0, compute_dtype=None, verbose=False,
              transfer="bank")

    EB.clear_cache()
    base = run_validation(datacfg, spec, **kw)
    mesh = make_mesh(jax.devices()[:8], mp=2)      # dp=4, mp=2
    sharded = run_validation(datacfg, spec, mesh=mesh, **kw)
    assert sharded["n_samples"] == base["n_samples"] == 6
    for k in base:
        np.testing.assert_allclose(sharded[k], base[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)
    EB.clear_cache()


def test_eval_bank_quantized(synth):
    """quantize=True composes with transfer="bank" (calibration consumes the
    first bank batch; the chained iterator must not double-run it)."""
    import singleshotpose_tpu.data.eval_bank as EB

    datacfg, cfgfile, _ = synth
    spec = DarknetSpec(parse_cfg(cfgfile))
    params, bstats = spec.init_params(jax.random.PRNGKey(5))
    kw = dict(params=params, batch_stats=bstats, batch_size=6,
              num_workers=0, compute_dtype=None, verbose=False,
              quantize=True)

    EB.clear_cache()
    base = run_validation(datacfg, spec, transfer="rgb", **kw)
    banked = run_validation(datacfg, spec, transfer="bank", **kw)
    assert banked["n_samples"] == 6
    for k in base:
        np.testing.assert_allclose(banked[k], base[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)
    EB.clear_cache()


def test_eval_transfer_auto_policy(monkeypatch):
    """eval_transfer="auto" resolves to bank when the HBM budget allows,
    evicts the bank LRU under pressure, and streams rgb when truly tight
    (VERDICT r3 #4); explicit modes pass through untouched."""
    import singleshotpose_tpu.drivers as D
    from singleshotpose_tpu.data import eval_bank as EB

    rc = TrainRunConfig()  # default eval_transfer="auto"
    GB = 1 << 30

    # no memory accounting (CPU backend) -> bank
    monkeypatch.setattr(D, "_hbm_free_bytes", lambda: None)
    assert D._resolve_eval_transfer(rc, 2 * GB) == "bank"

    # plenty of headroom -> bank
    monkeypatch.setattr(D, "_hbm_free_bytes", lambda: 8 * GB)
    assert D._resolve_eval_transfer(rc, 2 * GB) == "bank"

    # tight and nothing cached to evict -> rgb fallback
    monkeypatch.setattr(D, "_hbm_free_bytes", lambda: 2 * GB)
    EB.clear_cache()
    assert D._resolve_eval_transfer(rc, 2 * GB) == "rgb"

    # tight but evicting cached banks frees enough -> evict + bank
    class _FakeBank:
        def nbytes(self):
            return 2 * GB
    EB._CACHE["stale"] = _FakeBank()
    assert D._resolve_eval_transfer(rc, 2 * GB) == "bank"
    assert len(EB._CACHE) == 0  # LRU was evicted

    # explicit modes bypass the policy entirely
    monkeypatch.setattr(D, "_hbm_free_bytes",
                        lambda: (_ for _ in ()).throw(AssertionError))
    for mode in ("rgb", "yuv420", "bank"):
        rc2 = TrainRunConfig(eval_transfer=mode)
        assert D._resolve_eval_transfer(rc2, 2 * GB) == mode


def test_train_eval_auto_uses_bank(synth, monkeypatch):
    """The default (auto) in-training eval goes through the HBM bank when
    the budget preflight passes, and falls back to streaming when it
    doesn't — metric values identical either way (bit-identical pixels)."""
    import singleshotpose_tpu.drivers as D
    from singleshotpose_tpu.data import eval_bank as EB

    datacfg, cfgfile, backup = synth
    EB.clear_cache()
    calls = []
    real_build = EB.build_eval_bank

    def spy(*a, **k):
        calls.append(1)
        return real_build(*a, **k)
    monkeypatch.setattr(EB, "build_eval_bank", spy)

    rc = TrainRunConfig(eval_every=1, eval_after=0, num_workers=0,
                        eval_batch_size=3, bg_dir="/nonexistent",
                        log_every=2, max_epochs_override=2)
    rc.compute_dtype = None
    res_bank = run_training(datacfg, cfgfile, None, 100, rc)
    assert calls, "auto never built an eval bank on an unconstrained backend"
    assert len(calls) == 1, "bank must be LRU-cached across eval epochs"

    # force the tight-budget path: identical accuracies via streaming
    monkeypatch.setattr(D, "_hbm_free_bytes", lambda: 0)
    calls.clear()
    EB.clear_cache()
    res_rgb = run_training(datacfg, cfgfile, None, 100, rc)
    assert not calls, "tight budget must not build a bank"
    np.testing.assert_allclose(
        res_bank["history"]["testing_accuracies"],
        res_rgb["history"]["testing_accuracies"], rtol=0, atol=0)
