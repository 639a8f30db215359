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


def test_train_step_bench_body_traces(monkeypatch):
    monkeypatch.setattr(bench, "SIZE", 64)
    step_ms, sps = bench.bench_train_step(batch=2, chain=1)
    assert step_ms > 0 and sps > 0


def test_train_e2e_device_bank_bench_body_traces(monkeypatch, tmp_path):
    """bench_train_e2e_device_bank end to end at 64², batch 2 on CPU.

    Exercises the Loader(backend="device_bank") → fused-step handoff (bank
    build, device-resident batches feeding the step directly)."""
    monkeypatch.setattr(bench, "SIZE", 64)
    monkeypatch.setattr(bench, "EVAL_FRAMES", 4)
    monkeypatch.setattr(bench, "TRAIN_BASE", str(tmp_path / "bench_train"))
    sps = bench.bench_train_e2e_device_bank(batch=2)
    assert sps > 0
