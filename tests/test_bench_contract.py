"""Contract tests for the repo-root benchmark drivers (bench.py).

bench.py runs only on TPU in practice, so package refactors can silently
break it (observed: a ``_synthesize_one`` signature change that left
``bench_synth_scenes`` calling the old 2-arg form — every test passed, the
bench died at runtime).  These tests TRACE the device-side benchmark bodies
on the CPU backend at tiny shapes, so any call-signature or shape drift
between bench.py and the package fails in CI instead of on the chip.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_fake_scene_bank_matches_package_layout():
    bank, N = bench._fake_scene_bank()
    assert N == bank.base_index.shape[0] == bank.images.shape[0]
    # sentinel row for out-of-class base frames (device_synth contract)
    assert bank.companions.shape == (14, 8)
    assert bank.base_class.max() < bank.companions.shape[0]


def test_synth_bench_body_traces_and_runs_tiny(monkeypatch):
    """One iteration of bench_synth_scenes' chained body at 64² on CPU."""
    monkeypatch.setattr(bench, "SIZE", 64)
    sps = bench.bench_synth_scenes(batch=2, iters=1)
    assert sps > 0


def test_train_multi_e2e_bench_body_traces(monkeypatch):
    """bench_train_multi_e2e end to end at 64², batch 2, 1 iter on CPU.

    Exercises the synth → fused multi train step composition (including the
    label-layout handoff: synth emits (B, 50·21) flat rows, the step's
    target argument)."""
    monkeypatch.setattr(bench, "SIZE", 64)
    sps = bench.bench_train_multi_e2e(batch=2, iters=1)
    assert sps > 0


def test_infer_bench_body_traces(monkeypatch):
    """bench_infer's chained forward traces at tiny batch/size on CPU.

    Full 416² on CPU is too slow for CI; shrinking BATCH/SIZE/CHAIN keeps
    the identical code path (folded forward + decode + best_boxes chain)."""
    monkeypatch.setattr(bench, "BATCH", 1)
    monkeypatch.setattr(bench, "SIZE", 64)
    monkeypatch.setattr(bench, "CHAIN", 1)
    fps = bench.bench_infer()
    assert fps > 0


def test_latency_b1_bench_two_point_fit(monkeypatch):
    """bench_latency_b1's chain fit at tiny scale on CPU: slope must be
    positive and the fixed dispatch non-negative (the fit clamps)."""
    monkeypatch.setattr(bench, "SIZE", 64)
    slope_ms, fixed_ms = bench.bench_latency_b1(n_lo=1, n_hi=3)
    assert slope_ms > 0 and fixed_ms >= 0


def test_train_step_bench_body_traces(monkeypatch):
    monkeypatch.setattr(bench, "SIZE", 64)
    step_ms, sps = bench.bench_train_step(batch=2, chain=1)
    assert step_ms > 0 and sps > 0


def test_train_multi_step_bench_body_traces(monkeypatch):
    """Pure multi-object step bench (synthesis excluded): 160-ch head, 5
    anchors, CE class loss.  Pins the loss_config_from_spec(multi=True) →
    make_train_step handoff bench.py relies on for train_multi_step_ms_b32."""
    monkeypatch.setattr(bench, "SIZE", 64)
    step_ms, sps = bench.bench_train_multi_step(batch=2, chain=1)
    assert step_ms > 0 and sps > 0


def test_int8_acc_bench_multi_seed_contract(monkeypatch, tmp_path):
    """bench_int8_acc's seed loop + spread aggregation at tiny scale on CPU.

    Pins the seeded Loader/run_validation composition and the field set the
    round artifact publishes (mean, min..max range, n, seeds)."""
    monkeypatch.setattr(bench, "SIZE", 64)
    r = bench.bench_int8_acc(n_train=8, n_eval=4, n_epochs=1, batch=4,
                             seeds=(0, 1))
    assert r["int8_seeds"] == 2 and r["int8_eval_n"] == 8
    assert r["int8_acc_delta_range"][0] <= r["int8_acc_delta"] \
        <= r["int8_acc_delta_range"][1]
    assert r["int8_px_delta_range"][0] <= round(r["int8_px_delta"], 3) + 1e-6
    assert all(np.isfinite(v) for v in
               (r["acc2d5px_bf16"], r["acc2d5px_int8"], r["int8_px_delta"]))


def test_int8_acc_multi_bench_body_traces(monkeypatch):
    """bench_int8_acc_multi end to end at tiny scale on CPU: multi net
    training, fold, calibrate→quantize→apply_quantized, class-picked decode,
    pose_metrics.  Pins the quantized valid-multi eval composition."""
    monkeypatch.setattr(bench, "SIZE", 64)
    r = bench.bench_int8_acc_multi(n_scenes=2, iters=2)
    assert r["int8_multi_eval_n"] == 6
    assert np.isfinite(r["int8_multi_acc_delta"])
    assert np.isfinite(r["int8_multi_px_delta"])


def test_train_e2e_device_bank_bench_body_traces(monkeypatch, tmp_path):
    """bench_train_e2e_device_bank end to end at 64², batch 2 on CPU.

    Exercises the Loader(backend="device_bank") → fused-step handoff (bank
    build, device-resident batches feeding the step directly)."""
    monkeypatch.setattr(bench, "SIZE", 64)
    monkeypatch.setattr(bench, "EVAL_FRAMES", 4)
    monkeypatch.setattr(bench, "TRAIN_BASE", str(tmp_path / "bench_train"))
    sps = bench.bench_train_e2e_device_bank(batch=2)
    assert sps > 0


def test_train_cost_model_rungs_trace(monkeypatch):
    """bench_train_cost_model's ablation ladder at tiny scale on CPU.

    Pins the rung bodies against the package (net.apply's train/eval return
    convention, region_loss/grad/sgd_apply signatures, the fori_loop carry
    perturbation) and the published traincost_* field set the design.md §8d
    table is sourced from."""
    monkeypatch.setattr(bench, "SIZE", 64)
    r = bench.bench_train_cost_model(batch=2, chain=1)
    for k in ("traincost_full_ms", "traincost_fwd_ms", "traincost_bwd_ms",
              "traincost_bn_stats_ms", "traincost_loss_ms",
              "traincost_opt_ms", "traincost_sgd_alone_ms",
              "traincost_fwd_mxu_ideal_ms"):
        assert np.isfinite(r[k]), k
    assert r["traincost_full_ms"] > 0 and r["traincost_sgd_alone_ms"] > 0


def test_shaded_acc_bench_body_traces(monkeypatch):
    """bench_acc_shaded end to end at tiny scale on CPU: shaded dataset
    generation (disjoint train/test poses), device_bank training epochs with
    the warmup/decay schedule, then the bf16 AND int8 run_validation passes
    and the acc*_shaded field set."""
    monkeypatch.setattr(bench, "SIZE", 64)
    r = bench.bench_acc_shaded(n_train=4, n_eval=2, n_epochs=4, batch=2)
    assert r["shaded_eval_n"] == 2
    for k in ("acc2d5px_shaded_bf16", "acc2d5px_shaded_int8",
              "px_err_shaded_bf16", "px_err_shaded_int8"):
        assert np.isfinite(r[k]), k


def test_shaded_multi_acc_bench_body_traces(monkeypatch):
    """bench_acc_shaded_multi end to end at tiny scale on CPU: the shaded
    13-class corpus → DeviceSceneBank assembly, the chained on-device
    synth→train-step loop (bank passed as an argument, not baked into the
    program), held-out render_scene_multi eval, class-picked decode, and the
    bf16/int8 field set."""
    monkeypatch.setattr(bench, "SIZE", 64)
    r = bench.bench_acc_shaded_multi(nf=2, n_eval=2, steps=4, batch=2,
                                     chunk=2)
    assert r["multi_shaded_eval_n"] == 6
    for k in ("acc2d5px_multi_shaded_bf16", "acc2d5px_multi_shaded_int8",
              "px_err_multi_shaded_bf16", "px_err_multi_shaded_int8"):
        assert np.isfinite(r[k]), k


def test_microbatch_bench_body_traces(monkeypatch):
    """bench_microbatch's closed-loop client drive at tiny scale on CPU.

    Exercises the full serving-concurrency artifact path: AOT per-bucket
    compiles, the MicroBatcher dispatch/result pipeline, the client threads,
    and the p50/p99/mean-bucket reduction — so a serving.py or bench knob
    drift fails in CI, not on the chip (the round-4 verdict's complaint was
    exactly that these numbers had no artifact)."""
    monkeypatch.setattr(bench, "SIZE", 64)
    out = bench.bench_microbatch(duration=0.6, n_hi=2, buckets=(1, 2))
    for k in ("microbatch_fps_1c", "microbatch_fps_16c",
              "microbatch_p50_ms", "microbatch_p99_ms",
              "microbatch_mean_bucket"):
        assert k in out, k
    assert out["microbatch_fps_1c"] > 0 and out["microbatch_fps_16c"] > 0
    assert out["microbatch_p99_ms"] >= out["microbatch_p50_ms"]
    assert out["microbatch_mean_bucket"] >= 1.0


def test_loader_scaling_bench_body_traces(monkeypatch):
    """bench_loader_scaling at 1 worker, tiny dataset, short window on CPU:
    the native decode+augment pool must emit frames and publish the
    loader_fps_w* / loader_host_cores fields the README cites."""
    pytest.importorskip("PIL")
    monkeypatch.setattr(bench, "SIZE", 64)
    monkeypatch.setattr(bench, "EVAL_FRAMES", 8)
    monkeypatch.setattr(bench, "TRAIN_BASE", "/tmp/ssp_bench_contract_loader")
    try:
        out = bench.bench_loader_scaling(workers=(1,), batch=4,
                                         min_seconds=0.3)
    except (RuntimeError, OSError) as e:
        pytest.skip(f"native loader unavailable: {e!r}")
    assert out["loader_fps_w1"] > 0
    assert out["loader_host_cores"] >= 1
