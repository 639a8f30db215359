"""Headline benchmarks: inference fps (the driver metric), fused-train-step
throughput, and end-to-end eval fps on synthetic LINEMOD.

Methodology (device metrics): N executions are chained on-device inside one
jitted ``lax.fori_loop`` (iteration i+1's input depends on iteration i's
output), so a single host sync times N real sequential executions.  Naive
dispatch-loop timing is wrong on this platform: dispatch is async and
``block_until_ready`` returns long before the device finishes through the
axon tunnel (observed 500k "fps" — past the chip's theoretical peak).

The eval benchmark is deliberately end-to-end (reference hot path
``valid.py:107-200``): JPEG decode → resize → uint8 h2d → forward+decode on
device → batched PnP → full metric suite, on a generated LINEMOD-format
dataset, so host pipeline regressions are visible round-over-round.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Baseline: the CVPR'18 paper's real-time claim, ~50 fps on a Titan X
(reference README.md:11 / arXiv:1711.08848); the repo itself publishes no
numbers (BASELINE.md).
"""

import argparse
import json
import os
import subprocess
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# persistent XLA compilation cache: the bench compiles ~8 executables
# (inference chain, train chain, eval fwd ×2 transfers, PnP, ...) totalling
# several minutes; cached, repeat runs start in seconds
os.makedirs("/tmp/ssp_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ssp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_FPS = 50.0  # Titan X real-time claim from the paper
BATCH = 128          # throughput-optimal on v5e (32→2.4k, 64→3.1k, 128→4.2k fps)
SIZE = 416
CHAIN = 30
TRAIN_BATCH = 8      # the reference single-object config ([net] batch=8)
TRAIN_BASE = "/tmp/ssp_bench_train"   # shared by the two train-e2e benches
                                      # (tests monkeypatch this to a tmp dir)
TRAIN_CHAIN = 20
EVAL_FRAMES = 256
EVAL_BATCH = 48


V5E_PEAK_BF16 = 197e12   # TPU v5e: 197 TFLOP/s bf16, 394 TOPS int8
V5E_PEAK_INT8 = 394e12   # (per-chip peaks; MFU = achieved / peak)


def _model_flops_per_frame(net, size: int) -> float:
    """Analytic conv FLOPs (2·MACs) for one frame at a square input size.

    Walks the cfg-compiled spec with the same shape propagation the forward
    pass uses (convs are 'same'-padded in darknet pose cfgs; maxpool stride-s
    divides; reorg stride-s divides; route/shortcut reuse cached shapes).
    Non-conv ops are ignored — convs carry ~99.9% of the FLOPs.
    """
    from singleshotpose_tpu.models.darknet import (ConvSpec, MaxPoolSpec,
                                                   ReorgSpec, RouteSpec,
                                                   ShortcutSpec)
    h = w = size
    shapes = []                      # per-layer (h, w)
    flops = 0.0
    for spec in net.layers:
        if isinstance(spec, ConvSpec):
            h = (h + 2 * spec.pad - spec.size) // spec.stride + 1
            w = (w + 2 * spec.pad - spec.size) // spec.stride + 1
            flops += 2.0 * h * w * spec.in_filters * spec.filters \
                * spec.size * spec.size
        elif isinstance(spec, MaxPoolSpec):
            if spec.stride > 1:
                h, w = h // spec.stride, w // spec.stride
        elif isinstance(spec, ReorgSpec):
            h, w = h // spec.stride, w // spec.stride
        elif isinstance(spec, RouteSpec):
            h, w = shapes[spec.layers[0]]
        elif isinstance(spec, ShortcutSpec):
            h, w = shapes[spec.from_layer]
        shapes.append((h, w))
    return flops


def _infer_chain(quantize: bool = False):
    """(chained_infer, folded_params, make_input): the single-object
    forward+decode chain shared by the fps and latency benches."""
    from singleshotpose_tpu.models.darknet import fold_batchnorm
    from singleshotpose_tpu.ops.decode import best_boxes, decode_grid
    from singleshotpose_tpu.zoo import yolo_pose_single

    net = yolo_pose_single()
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    folded = jax.device_put(fold_batchnorm(net, params, bstats))
    K, C, nA = net.num_keypoints, net.num_classes, net.num_anchors
    if quantize:
        from singleshotpose_tpu.models.quantize import (
            apply_quantized, calibrate_activations, quantize_folded)
        calib = jnp.asarray(
            np.random.RandomState(1).rand(8, SIZE, SIZE, 3), jnp.float32)
        # per_channel = the served default (drivers/_eval_pass, ssp quantize)
        amax = calibrate_activations(net, folded, calib, per_channel=True)
        folded = jax.device_put(quantize_folded(net, folded, amax))
        fwd = lambda p, x: apply_quantized(net, p, x,
                                           compute_dtype=jnp.bfloat16)
    else:
        fwd = lambda p, x: net.apply_folded(p, x, compute_dtype=jnp.bfloat16)

    @partial(jax.jit, static_argnames=("iters",))
    def chained_infer(p, x, iters):
        def body(i, carry):
            x, acc = carry
            head = fwd(p, x)
            boxes = best_boxes(decode_grid(head.astype(jnp.float32), K, C, nA))
            # data dependency: next input is perturbed by this step's output
            return (x * 0.999 + jnp.mean(boxes) * 1e-6, acc + boxes)

        x, acc = jax.lax.fori_loop(
            0, iters, body, (x, jnp.zeros((x.shape[0], 2 * K + 3), x.dtype)))
        return acc

    def make_input(b):
        return jax.device_put(jnp.asarray(
            np.random.RandomState(0).rand(b, SIZE, SIZE, 3), jnp.float32))

    return chained_infer, folded, make_input


def bench_infer(quantize: bool = False, batch: int = None):
    """Single-chip 416² inference fps incl. grid decode.

    ``quantize=False``: bf16, BN folded. ``quantize=True``: the int8 serving
    path (models/quantize.py) — per-channel int8 weights, calibrated
    activation scales, int32 MXU accumulation (v5e runs int8 at 2× bf16 peak;
    pose-metric parity on trained nets is validated by
    ``examples/overfit_validation.py --quantize``).
    """
    chained_infer, folded, make_input = _infer_chain(quantize)
    b = BATCH if batch is None else batch
    x = make_input(b)

    out = chained_infer(folded, x, CHAIN)       # compile + warm
    float(jnp.sum(out))                          # full host sync
    t0 = time.perf_counter()
    out = chained_infer(folded, x, CHAIN)
    float(jnp.sum(out))                          # sync: all CHAIN iters done
    dt = time.perf_counter() - t0
    return b * CHAIN / dt


def bench_latency_b1(quantize: bool = False, n_lo: int = 100,
                     n_hi: int = 400):
    """Batch-1 serving latency split into (on-device ms/frame, fixed
    dispatch ms) by a two-point chain-length fit.

    A single timed chain of N iterations costs F + N·c where F is the fixed
    host→device dispatch + scalar device_get round-trip (~25 ms through
    this dev tunnel, sub-ms on a real TPU VM's PCIe) and c is the true
    on-device forward+decode latency.  Timing one short chain (rounds 2-3
    did CHAIN=30) reports c + F/30, which moved with tunnel load — that is
    why the "batch-1 latency" artifact drifted 1.19→1.67→1.82 ms across
    rounds while nothing in the program changed.  The slope
    c = (t(n_hi)−t(n_lo))/(n_hi−n_lo) cancels F and is stable; both are
    reported (``serving_latency_ms_b1``, ``serving_dispatch_ms``).  Median
    of 3 at each point.  Context: the paper's "real-time" is ~20 ms/frame
    on a Titan X (reference README.md:11).
    """
    chained_infer, folded, make_input = _infer_chain(quantize)
    x = make_input(1)

    def timed(iters):
        out = chained_infer(folded, x, iters)   # compile + warm this iters
        float(jnp.sum(out))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = chained_infer(folded, x, iters)
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]
    t_lo, t_hi = timed(n_lo), timed(n_hi)
    slope_ms = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
    fixed_ms = t_lo * 1e3 - n_lo * slope_ms
    return slope_ms, max(fixed_ms, 0.0)


def bench_microbatch(duration: float = 8.0, n_hi: int = 16,
                     buckets=(1, 2, 4, 8, 16)) -> dict:
    """Driver-captured serving-concurrency numbers for the MicroBatcher.

    Closed-loop clients (each submits one 416² uint8 frame, blocks on its
    result, repeats) against AOT-compiled per-bucket serving executables —
    the deployment configuration ``serving.MicroBatcher`` documents.  Two
    load levels: 1 client (serial baseline: every request is a batch-1
    dispatch) and ``n_hi`` concurrent clients (the coalescing regime).

    Reported per level: completed requests/s and client-observed latency
    p50/p99 (includes the queue wait, h2d, device compute, and the d2h
    device_get — the full serving path; through this dev tunnel the fixed
    ~25 ms dispatch round-trip dominates, see ``serving_dispatch_ms``), plus
    the mean realized batch size (frames per device dispatch) at high load —
    the direct measure of how well coalescing is working.

    The reference has no serving layer (``valid.py:36-57`` ships the whole
    torch stack); this benches the framework's own flagship subsystem.
    """
    import threading

    from singleshotpose_tpu.models.darknet import fold_batchnorm
    from singleshotpose_tpu.serving import MicroBatcher, aot_serving
    from singleshotpose_tpu.zoo import yolo_pose_single

    net = yolo_pose_single()
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    folded = jax.device_put(fold_batchnorm(net, params, bstats))

    calls = {b: 0 for b in buckets}
    calls_lock = threading.Lock()
    fns = {}
    for b in buckets:
        aot = aot_serving(net, folded, batch=b, width=SIZE, height=SIZE,
                          pick=("best",))

        def counted(imgs, _b=b, _f=aot):
            with calls_lock:
                calls[_b] += 1
            return _f(imgs)

        fns[b] = counted
    frame = (np.random.RandomState(0).rand(SIZE, SIZE, 3) * 255).astype(
        np.uint8)

    def run_level(n_clients):
        with calls_lock:
            for b in buckets:
                calls[b] = 0
        lats = []
        lat_lock = threading.Lock()
        stop = threading.Event()

        mb = MicroBatcher(fns, height=SIZE, width=SIZE, buckets=buckets,
                          max_delay_ms=2.0)

        def client():
            while not stop.is_set():
                t0 = time.perf_counter()
                mb.infer(frame)
                dt = time.perf_counter() - t0
                with lat_lock:
                    lats.append(dt)

        with mb:
            # warm every bucket executable through the full dispatch path
            # (AOT skips tracing, but the first execution of each program
            # still pays the tunnel's program-load cost — without this the
            # p99 times warmup, not steady state)
            for b in buckets:
                jax.block_until_ready(
                    fns[b](np.zeros((b,) + (SIZE, SIZE, 3), np.uint8)))
            mb.infer(frame)                     # warm the batcher path
            with calls_lock:
                for b in buckets:
                    calls[b] = 0
            threads = [threading.Thread(target=client)
                       for _ in range(n_clients)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            time.sleep(duration)
            stop.set()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
        with calls_lock:
            n_batches = sum(calls.values())
        lats_ms = np.sort(np.asarray(lats)) * 1e3
        return {"fps": len(lats) / dt,
                "p50_ms": float(np.percentile(lats_ms, 50)),
                "p99_ms": float(np.percentile(lats_ms, 99)),
                "mean_bucket": len(lats) / max(n_batches, 1)}

    lo = run_level(1)
    hi = run_level(n_hi)
    return {"microbatch_fps_1c": round(lo["fps"], 1),
            "microbatch_fps_16c": round(hi["fps"], 1),
            "microbatch_p50_ms_1c": round(lo["p50_ms"], 1),
            "microbatch_p50_ms": round(hi["p50_ms"], 1),
            "microbatch_p99_ms": round(hi["p99_ms"], 1),
            "microbatch_mean_bucket": round(hi["mean_bucket"], 2)}


def bench_infer_multi():
    """Multi-object (OCCLUSION) inference fps: 160-ch head, 5 anchors, fused
    per-class box pick (the reference hot path ``valid_multi.py:89-123``)."""
    from singleshotpose_tpu.models.darknet import fold_batchnorm
    from singleshotpose_tpu.ops.decode import best_boxes_per_class, decode_grid
    from singleshotpose_tpu.zoo import yolo_pose_multi

    net = yolo_pose_multi()
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    folded = jax.device_put(fold_batchnorm(net, params, bstats))
    K, C, nA = net.num_keypoints, net.num_classes, net.num_anchors

    @partial(jax.jit, static_argnames=("iters",))
    def chained(p, x, iters):
        def body(i, carry):
            x, acc = carry
            head = net.apply_folded(p, x, compute_dtype=jnp.bfloat16)
            boxes = best_boxes_per_class(
                decode_grid(head.astype(jnp.float32), K, C, nA), 0.05)
            s = jnp.mean(boxes)
            return (x * 0.999 + s * 1e-6, acc + s)
        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))[1]

    x = jax.device_put(jnp.asarray(
        np.random.RandomState(0).rand(BATCH, SIZE, SIZE, 3), jnp.float32))
    r = chained(folded, x, CHAIN)
    float(r)
    t0 = time.perf_counter()
    r = chained(folded, x, CHAIN)
    float(r)
    return BATCH * CHAIN / (time.perf_counter() - t0)


def bench_pnp():
    """Batched PnP throughput (poses/s): DLT + LM on 9 correspondences —
    the on-device replacement for the reference's per-frame cv2.solvePnP
    (``utils.py:86-100``)."""
    from singleshotpose_tpu.ops.pnp import pnp_batched

    rng = np.random.RandomState(0)
    N, CH = 1024, 10
    K = np.array([[572.4114, 0, 325.2611], [0, 573.5704, 242.0489],
                  [0, 0, 1]], np.float32)
    pts3 = np.concatenate([np.zeros((1, 3)), rng.uniform(-.05, .05, (8, 3))]
                          ).astype(np.float32)
    Rts = []
    p2 = np.zeros((N, 9, 2), np.float32)
    for i in range(N):
        w = rng.randn(3) * .4
        th = np.linalg.norm(w)
        Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = np.eye(3) + np.sin(th) / th * Kx + (1 - np.cos(th)) / th**2 * Kx @ Kx
        t = np.array([rng.uniform(-.05, .05), rng.uniform(-.05, .05),
                      rng.uniform(.6, .9)])
        cam = pts3 @ R.T + t
        pix = cam @ K.T
        p2[i] = pix[:, :2] / pix[:, 2:3]
    p3 = jnp.asarray(pts3)          # (9,3) shared across the batch
    p2 = jnp.asarray(p2)
    Kj = jnp.asarray(K)

    @partial(jax.jit, static_argnames=("iters",))
    def chained(p2, iters):
        def body(i, carry):
            p2, acc = carry
            R, t = pnp_batched(p3, p2, Kj)
            s = jnp.mean(t)
            return (p2 + s * 1e-9, acc + s)
        return jax.lax.fori_loop(0, iters, body, (p2, jnp.float32(0)))[1]

    r = chained(p2, CH)
    float(r)
    t0 = time.perf_counter()
    r = chained(p2, CH)
    float(r)
    return N * CH / (time.perf_counter() - t0)


def bench_train_step(batch: int = TRAIN_BATCH, chain: int = TRAIN_CHAIN):
    """Fused train-step time (fwd+loss+bwd+SGD at 416²).

    Chained on-device: iteration i+1 consumes iteration i's updated state,
    so one sync times ``chain`` real sequential steps (reference hot loop
    ``train.py:76-129``).  Default is the reference config (batch 8);
    main() also reports the throughput-optimal batch-128 step, where the
    early layers' small-channel layout overheads amortize (~1.55x the
    samples/s of the fused-stem batch-8 step; the stem auto-disables at
    batch >= 64 where batch fills the lane axis).  Returns
    (step_ms, samples_per_sec).
    """
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_single

    net = yolo_pose_single()
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    state = init_train_state(params, bstats)
    raw_step = make_train_step(net, RegionLossConfig.single(),
                               weight_decay=0.0005 * batch,
                               momentum=0.9, compute_dtype=jnp.bfloat16,
                               donate=False, jit_compile=False,
                               fused_stem=jax.default_backend() == "tpu")

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, SIZE, SIZE, 3), jnp.float32)
    target = np.zeros((batch, 50 * 21), np.float32)
    tt = target.reshape(batch, 50, 21)
    tt[:, 0, 1:19] = rng.uniform(0.2, 0.8, (batch, 18))
    tt[:, 0, 19:21] = [0.3, 0.4]
    target = jnp.asarray(target)

    @partial(jax.jit, static_argnames=("iters",), donate_argnums=(0,))
    def chained_train(state, images, target, iters):
        def body(i, st):
            st, _stats = raw_step(st, images, target,
                                  jnp.float32(0.001 / batch), 100)
            return st
        return jax.lax.fori_loop(0, iters, body, state)

    state = chained_train(state, images, target, chain)  # compile+warm
    int(jax.device_get(state.seen))                            # sync
    t0 = time.perf_counter()
    state = chained_train(state, images, target, chain)
    int(jax.device_get(state.seen))
    dt = time.perf_counter() - t0
    step_ms = dt / chain * 1e3
    return step_ms, batch * chain / dt


def bench_train_step_dp_mesh(batch: int = TRAIN_BATCH,
                             chain: int = TRAIN_CHAIN):
    """Fused train step under a ("data","model") mesh with the SHARDED
    Pallas stem (shard_map over the data axis, psum'd BN stats).

    On the 1-chip bench device the mesh is degenerate (dp=1), so this
    measures that the shard_map stem path keeps the batch-8 step win when
    training goes data-parallel (round 2 disabled the stem under any mesh;
    the multichip execution semantics are pinned by
    tests/test_stem.py::test_train_step_mesh_fused_stem_* on the 8-device
    virtual mesh and dryrun_multichip).  Returns step_ms.

    BENCH_r03 reported 196.5 ms here — that was a RECOMPILE timed as step
    time, not execution: the state was built with default-placed momentum
    and ``seen`` next to NamedSharding params, the warm call returned a
    fully-NamedSharding state, and the timed call therefore had a new
    sharding signature and recompiled the whole chained program.  With
    every leaf placed via ``shard_train_state`` (as the drivers now do)
    input and output shardings match, the second call hits the executable
    cache (asserted below), and the steady-state meshed step equals the
    unmeshed one. The loss config also takes the mesh, matching
    ``drivers.run_training``'s meshed construction.
    """
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.parallel.sharding import (
        make_mesh, shard_host_batch, shard_train_state)
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_single

    mesh = make_mesh(dp=1, mp=1)
    net = yolo_pose_single()
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    state = shard_train_state(net, mesh, init_train_state(params, bstats))
    raw_step = make_train_step(net, RegionLossConfig.single(mesh=mesh),
                               weight_decay=0.0005 * batch,
                               momentum=0.9, compute_dtype=jnp.bfloat16,
                               donate=False, jit_compile=False,
                               fused_stem=jax.default_backend() == "tpu",
                               stem_mesh=mesh)

    rng = np.random.RandomState(0)
    images_h = rng.rand(batch, SIZE, SIZE, 3).astype(np.float32)
    target_h = np.zeros((batch, 50 * 21), np.float32)
    tt = target_h.reshape(batch, 50, 21)
    tt[:, 0, 1:19] = rng.uniform(0.2, 0.8, (batch, 18))
    tt[:, 0, 19:21] = [0.3, 0.4]
    images, target = shard_host_batch(mesh, images_h, target_h)

    @partial(jax.jit, static_argnames=("iters",), donate_argnums=(0,))
    def chained_train(state, images, target, iters):
        def body(i, st):
            st, _stats = raw_step(st, images, target,
                                  jnp.float32(0.001 / batch), 100)
            return st
        return jax.lax.fori_loop(0, iters, body, state)

    state = chained_train(state, images, target, chain)  # compile+warm
    int(jax.device_get(state.seen))
    t0 = time.perf_counter()
    state = chained_train(state, images, target, chain)
    int(jax.device_get(state.seen))
    step_ms = (time.perf_counter() - t0) / chain * 1e3
    # Guard against ever timing a recompile again: input and output state
    # shardings must match, so both calls share one executable.
    ncompiles = chained_train._cache_size()
    if ncompiles != 1:
        print(f"WARNING: dp-mesh chained step compiled {ncompiles}x — "
              "the timed call recompiled; sharding signature unstable")
    return step_ms


def bench_train_cost_model(batch: int = 128, chain: int = 8) -> dict:
    """Profiled cost model for the throughput-optimal batch-128 train step
    (VERDICT r4 #4): where do the non-MXU milliseconds go?

    Times a nested ablation ladder, every rung chained on-device so one
    sync covers ``chain`` real iterations (same discipline as
    :func:`bench_train_step`):

      ``noop``     carry plumbing alone (the ladder's loop-carried
                   image perturbation — measured so it can be subtracted)
      ``fwd_eval`` inference-mode forward (running BN stats, no stat calc)
      ``fwd``      train-mode forward (adds per-layer batch-stat reductions)
      ``fwdloss``  + build_targets + region loss (adds the L2 assignment)
      ``grad``     + full backward (jax.grad)
      ``sgd``      torch-SGD update alone on a fixed grads tree
      ``full``     the real fused step (fwd+loss+bwd+SGD, state carried)

    Differences between adjacent rungs attribute the step:
    loss = fwdloss − fwd; backward = grad − fwdloss; BN train-stat
    overhead = fwd − fwd_eval; optimizer = full − grad (cross-checked
    against the standalone ``sgd`` rung).  MXU-ideal times come from the
    conv FLOP count (fwd = 2·MACs, bwd = 2× fwd for dgrad+wgrad) at the
    197 TFLOP/s bf16 peak; XLA's compiled bytes-accessed per rung come from
    ``Compiled.cost_analysis()`` where available.  Results feed the
    design.md §8d cost-model table — no train-perf claim may outrun these
    fields.

    Ablation honesty: each non-``full`` rung re-runs on identical params
    every iteration, which XLA could hoist out of the loop (LICM) — so every
    rung's body perturbs the images by a loop-carried scalar derived from
    its own output (``images * (1 + 1e-38·out)``: numerically a no-op, but
    opaque to the compiler).  That perturbation pass is the ``noop`` rung
    and is subtracted from every reported rung.
    """
    from singleshotpose_tpu.ops.losses import RegionLossConfig, region_loss
    from singleshotpose_tpu.training import (init_train_state,
                                             make_train_step, sgd_apply)
    from singleshotpose_tpu.zoo import yolo_pose_single

    net = yolo_pose_single()
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    state = init_train_state(params, bstats)
    cfg = RegionLossConfig.single()

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, SIZE, SIZE, 3), jnp.float32)
    target_h = np.zeros((batch, 50 * 21), np.float32)
    tt = target_h.reshape(batch, 50, 21)
    tt[:, 0, 1:19] = rng.uniform(0.2, 0.8, (batch, 18))
    tt[:, 0, 19:21] = [0.3, 0.4]
    target = jnp.asarray(target_h)

    def fwd_fn(imgs, train):
        # train=True returns (out, new_batch_stats); train=False just out
        r = net.apply(params, imgs, batch_stats=bstats, train=train,
                      compute_dtype=jnp.bfloat16)
        return r[0] if train else r

    def loss_fn(p, imgs):
        out, new_stats = net.apply(p, imgs, batch_stats=bstats, train=True,
                                   compute_dtype=jnp.bfloat16)
        loss, _stats = region_loss(out, target, 100, cfg)
        return loss

    def time_body(body):
        """Chained timing of `body(images) -> scalar`; the scalar feeds the
        next iteration's input perturbation (defeats loop hoisting)."""
        @partial(jax.jit, static_argnames=("iters",))
        def run(imgs, acc, iters):
            def it(i, carry):
                acc = carry
                v = body(imgs * (1.0 + 1e-38 * acc))
                return v.astype(jnp.float32) * 1e-38
            return jax.lax.fori_loop(0, iters, it, acc)
        acc = run(images, jnp.float32(0.0), chain)   # compile+warm
        float(jax.device_get(acc))
        t0 = time.perf_counter()
        acc = run(images, acc, chain)
        float(jax.device_get(acc))
        return (time.perf_counter() - t0) / chain * 1e3

    t = {}
    # noop must CONSUME the perturbed array (a [0,0,0,0] pick would let XLA
    # dead-code the whole multiply): one fused read pass, the same cost the
    # perturbation adds ahead of each real rung's first cast
    rungs = [
        ("noop", lambda im: im.sum()),
        ("fwd_eval", lambda im: fwd_fn(im, False).sum()),
        ("fwd", lambda im: fwd_fn(im, True).sum()),
        ("fwdloss", lambda im: loss_fn(params, im)),
        ("grad", lambda im: sum(
            jnp.sum(g) for lg in jax.grad(loss_fn)(params, im).values()
            for g in lg.values())),
    ]
    for name, body in rungs:
        t[name] = time_body(body)
        print(f"# traincost rung {name}: {t[name]:.2f} ms", flush=True)

    # standalone SGD rung: params+momentum carried (real dependence)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-8), params)

    @partial(jax.jit, static_argnames=("iters",))
    def run_sgd(p, m, iters):
        def it(i, carry):
            return sgd_apply(carry[0], grads, carry[1], 1e-9, 5e-4, 0.9)
        p, m = jax.lax.fori_loop(0, iters, it, (p, m))
        # consume EVERY leaf of both outputs: per-leaf updates are
        # independent, so a partial reduction would let XLA DCE the rest
        # (block_until_ready is also a no-op through the axon tunnel —
        # only a scalar device_get really syncs, see module docstring)
        return sum(jnp.sum(l) for t_ in (p, m)
                   for lg in t_.values() for l in lg.values())
    float(jax.device_get(run_sgd(params, state.momentum, chain)))
    t0 = time.perf_counter()
    float(jax.device_get(run_sgd(params, state.momentum, chain)))
    t["sgd"] = (time.perf_counter() - t0) / chain * 1e3

    full_ms, _ = bench_train_step(batch=batch, chain=chain)
    t["full"] = full_ms

    base = t["noop"]
    gf = _model_flops_per_frame(net, SIZE)
    out = {
        "traincost_full_ms": round(t["full"], 2),
        "traincost_fwd_ms": round(t["fwd"] - base, 2),
        "traincost_fwd_eval_ms": round(t["fwd_eval"] - base, 2),
        "traincost_bn_stats_ms": round(t["fwd"] - t["fwd_eval"], 2),
        "traincost_loss_ms": round(t["fwdloss"] - t["fwd"], 2),
        "traincost_bwd_ms": round(t["grad"] - t["fwdloss"], 2),
        "traincost_opt_ms": round(t["full"] - (t["grad"] - base), 2),
        "traincost_sgd_alone_ms": round(t["sgd"], 2),
        "traincost_carry_ms": round(base, 2),
        "traincost_fwd_mxu_ideal_ms": round(
            gf * batch / V5E_PEAK_BF16 * 1e3, 2),
        "traincost_bwd_mxu_ideal_ms": round(
            2 * gf * batch / V5E_PEAK_BF16 * 1e3, 2),
    }
    # XLA's own accounting of the full step (bytes → roofline attribution)
    try:
        raw_step = make_train_step(net, cfg, weight_decay=0.0005 * batch,
                                   momentum=0.9, compute_dtype=jnp.bfloat16,
                                   donate=False)
        ca = raw_step.lower(state, images, target, jnp.float32(1e-5),
                            100).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out["traincost_step_gbytes"] = round(
            float(ca.get("bytes accessed", 0.0)) / 1e9, 2)
        out["traincost_step_gflops"] = round(
            float(ca.get("flops", 0.0)) / 1e9, 1)
    except Exception as e:
        print(f"# cost_analysis unavailable: {e!r}")
    return out


def bench_train_multi_step(batch: int = 32, chain: int = TRAIN_CHAIN):
    """Fused MULTI-OBJECT train-step time (fwd+loss+bwd+SGD at 416²),
    synthesis excluded — the pure step the OCCLUSION trainer runs.

    The multi head is 160 channels / 5 anchors / 13 classes with an
    IoU anchor match + CE class loss (reference
    ``multi_obj_pose_estimation/yolo-pose-multi.cfg:235`` and
    ``region_loss_multi.py:66-77,169``), so this is a distinct program
    from the single-object step.  Default batch is the reference config
    (batch=32, ``yolo-pose-multi.cfg:3``); main() also reports the
    throughput-optimal batch-128 samples/s plus its MFU
    (``mfu_train_multi``).  Chained on-device like
    :func:`bench_train_step`.  Returns (step_ms, samples_per_sec).
    """
    from singleshotpose_tpu.drivers import loss_config_from_spec
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_multi

    net = yolo_pose_multi()
    state = init_train_state(*net.init_params(jax.random.PRNGKey(0)))
    loss_cfg = loss_config_from_spec(net, pretrain_num_epochs=0,
                                     im_width=640, im_height=480, multi=True)
    raw_step = make_train_step(net, loss_cfg, weight_decay=0.0005 * batch,
                               momentum=0.9, compute_dtype=jnp.bfloat16,
                               donate=False, jit_compile=False,
                               fused_stem=jax.default_backend() == "tpu" and
                               batch < 64)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, SIZE, SIZE, 3), jnp.float32)
    # 4 objects per scene, classes spread over the 13, plausible extents
    target = np.zeros((batch, 50, 21), np.float32)
    target[:, :4, 0] = rng.randint(0, 13, (batch, 4))
    target[:, :4, 1:19] = rng.uniform(0.2, 0.8, (batch, 4, 18))
    target[:, :4, 19:21] = rng.uniform(0.15, 0.3, (batch, 4, 2))
    target = jnp.asarray(target.reshape(batch, 50 * 21))

    @partial(jax.jit, static_argnames=("iters",), donate_argnums=(0,))
    def chained_train(state, images, target, iters):
        def body(i, st):
            st, _stats = raw_step(st, images, target,
                                  jnp.float32(0.001 / batch), 100)
            return st
        return jax.lax.fori_loop(0, iters, body, state)

    state = chained_train(state, images, target, chain)  # compile + warm
    int(jax.device_get(state.seen))
    t0 = time.perf_counter()
    state = chained_train(state, images, target, chain)
    int(jax.device_get(state.seen))
    dt = time.perf_counter() - t0
    return dt / chain * 1e3, batch * chain / dt


def _fake_scene_bank(nf: int = 30):
    """A LINEMOD-scale in-memory frame bank (13 objects × ``nf`` frames at
    640×480 — synthesis compute per scene is bank-size independent).
    Returns (device-placed DeviceSceneBank, total frames N)."""
    from singleshotpose_tpu.data.device_synth import DeviceSceneBank
    from singleshotpose_tpu.data.synth_multi import (ADD_OBJS,
                                                     OCCLUSION_CLASSES)

    rng = np.random.RandomState(0)
    NOBJ, NF = 13, nf
    N = NOBJ * NF
    imgs = rng.randint(0, 255, (N, 480, 640, 3), np.uint8)
    masks = np.zeros((N, 480, 640), np.uint8)
    for i in range(N):
        cx, cy = rng.randint(100, 540), rng.randint(80, 400)
        masks[i, cy - 50:cy + 50, cx - 50:cx + 50] = 255
    labels = np.zeros((N, 21), np.float32)
    labels[:, 0] = np.repeat(np.arange(NOBJ), NF)
    labels[:, 1:19:2] = rng.uniform(0.3, 0.7, (N, 9))
    labels[:, 2:19:2] = rng.uniform(0.3, 0.7, (N, 9))
    labels[:, 19:21] = 0.2
    comp = np.full((14, 8), -1, np.int32)
    cls_of = {o: i for i, o in enumerate(OCCLUSION_CLASSES)}
    for obj, names in ADD_OBJS.items():
        for j, nme in enumerate(names):
            comp[cls_of[obj], j] = cls_of[nme]
    bank = DeviceSceneBank(
        imgs, masks, labels, (np.arange(NOBJ) * NF).astype(np.int32),
        np.full(NOBJ, NF, np.int32), comp,
        rng.randint(0, 255, (16, 480, 640, 3), np.uint8),
        np.arange(N, dtype=np.int32),
        labels[:, 0].astype(np.int32)).device_put()
    return bank, N


def bench_synth_scenes(batch: int = 32, iters: int = 12, nf: int = 30,
                       attempts: int = None):
    """On-device multi-object scene synthesis throughput (scenes/s).

    Times ``data/device_synth._synthesize_one`` vmapped over a batch at 416²
    on a fabricated LINEMOD-scale bank, chained on-device (iteration i+1's
    indices consume iteration i's pixels so nothing hoists).  Replaces the
    host path's per-scene decode+paste loop (reference
    ``image_multi.py:299-383``).  ``attempts=None`` → the placement-parity
    default (host drop law, attempts=30); pass 6 for the throughput-tuned
    config (measured table in device_synth.py's docstring).
    """
    from singleshotpose_tpu.data.device_synth import (DeviceSynthStatic,
                                                      _synthesize_one)

    bank, N = _fake_scene_bank(nf)
    st = DeviceSynthStatic(propose_scale=4) if attempts is None else \
        DeviceSynthStatic(propose_scale=4, attempts=attempts)

    @partial(jax.jit, static_argnames=("iters",))
    def chained(bank, base0, key, iters):
        def body(i, carry):
            idxs, acc = carry
            keys = jax.random.split(jax.random.fold_in(key, i), batch)
            rows = jnp.take(bank.base_index, idxs)
            cls = jnp.take(bank.base_class, idxs)
            out, _lab = jax.vmap(partial(_synthesize_one, bank, out_w=SIZE,
                                         out_h=SIZE, st=st))(rows, cls, keys)
            idxs = (idxs + 1 + (out[0, 0, 0, 0] * 0).astype(jnp.int32)) % N
            return idxs, acc + out.mean()
        _, acc = jax.lax.fori_loop(
            0, iters, body, (base0, jnp.float32(0)))
        return acc

    base0 = jnp.arange(batch, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    float(chained(bank, base0, key, iters))          # compile + warm
    t0 = time.perf_counter()
    float(chained(bank, base0, key, iters))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_train_multi_e2e(batch: int = 32, iters: int = 8, nf: int = 30):
    """Multi-object (OCCLUSION) training END TO END with on-device scene
    synthesis: each chained iteration synthesizes its batch from the HBM
    frame bank and feeds the fused multi train step — zero host↔device image
    traffic, the host only dispatches.

    Synthesis shares the chip with the train step, so it costs chip time
    (not hidden): e2e ≈ 1/(1/synth_sps + 1/step_sps).  The measure that
    matters is vs the host path, where python scene synthesis caps the whole
    loop at ~15 scenes/s on a 1-core host (reference hot loop:
    ``train_multi.py:76-129`` + ``image_multi.py:299-383`` in workers).
    """
    from singleshotpose_tpu.data.device_synth import (DeviceSynthStatic,
                                                      _synthesize_one)
    from singleshotpose_tpu.drivers import loss_config_from_spec
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_multi

    bank, N = _fake_scene_bank(nf)
    st = DeviceSynthStatic(propose_scale=4)   # parity-default attempts (30)
    net = yolo_pose_multi()
    state = init_train_state(*net.init_params(jax.random.PRNGKey(0)))
    loss_cfg = loss_config_from_spec(net, pretrain_num_epochs=0,
                                     im_width=640, im_height=480, multi=True)
    raw_step = make_train_step(net, loss_cfg, weight_decay=0.0005 * batch,
                               momentum=0.9, compute_dtype=jnp.bfloat16,
                               donate=False, jit_compile=False,
                               fused_stem=jax.default_backend() == "tpu")

    @partial(jax.jit, static_argnames=("iters",), donate_argnums=(0,))
    def chained(state, bank, key, iters):
        def body(i, carry):
            state, idx = carry
            keys = jax.random.split(jax.random.fold_in(key, i), batch)
            rows = jnp.take(bank.base_index, idx)
            cls = jnp.take(bank.base_class, idx)
            imgs, labels = jax.vmap(partial(
                _synthesize_one, bank, out_w=SIZE, out_h=SIZE, st=st))(
                    rows, cls, keys)
            state, _stats = raw_step(state, imgs, labels,
                                     jnp.float32(0.001 / batch), 100)
            return state, (idx + batch) % N
        state, _ = jax.lax.fori_loop(
            0, iters, body, (state, jnp.arange(batch, dtype=jnp.int32)))
        return state

    key = jax.random.PRNGKey(0)
    state = chained(state, bank, key, iters)         # compile + warm
    int(jax.device_get(state.seen))
    t0 = time.perf_counter()
    state = chained(state, bank, key, iters)
    int(jax.device_get(state.seen))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_train_e2e():
    """End-to-end training throughput: native u8 loader (decode cached after
    epoch 1 + bg LRU) → h2d → fused donated step, steady-state epoch.

    The reference's whole hot loop (``train.py:76-129`` + DataLoader workers)
    measured as one number, so host-pipeline regressions are visible.
    """
    from singleshotpose_tpu.data.pipeline import PoseDataset, Loader
    from singleshotpose_tpu.data.prefetch import prefetch
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_single

    base = TRAIN_BASE
    _gen_eval_dataset(base, EVAL_FRAMES, masks=True)
    net = yolo_pose_single()
    state = init_train_state(*net.init_params(jax.random.PRNGKey(0)))
    step = make_train_step(net, RegionLossConfig.single(),
                           weight_decay=0.0005 * TRAIN_BATCH, momentum=0.9,
                           compute_dtype=jnp.bfloat16,
                           fused_stem=jax.default_backend() == "tpu")
    ds = PoseDataset(f"{base}/test.txt", train=True,
                     bg_file_names=[f"{base}/bg.jpg"], cache_decoded=True)

    def epoch(state):
        # fixed 416 (the stage-0 multi-scale width) → one executable
        loader = Loader(ds, TRAIN_BATCH, schedule=None,
                        fixed_shape=(SIZE, SIZE), num_workers=2, seed=0,
                        out_uint8=True)
        n = 0
        for images, labels in prefetch(loader):
            state, stats = step(state, jnp.asarray(images),
                                jnp.asarray(labels),
                                np.float32(1e-4), np.int32(100))
            n += TRAIN_BATCH
        int(jax.device_get(state.seen))         # real sync
        return state, n

    state, _ = epoch(state)                     # warm: compile + decode cache
    t0 = time.perf_counter()
    state, n = epoch(state)
    dt = time.perf_counter() - t0
    return n / dt


def bench_train_e2e_device_bank(batch: int = TRAIN_BATCH):
    """End-to-end single-object training with the HBM frame bank
    (``--loader_backend device_bank``): the corpus is decoded once into
    device memory, then every batch is one jitted gather→crop→composite→HSV
    program chained into the fused train step — zero per-batch host image
    traffic (the host only draws rng params and dispatches).

    Same dataset/step as :func:`bench_train_e2e`, so the pair isolates what
    the host loader + h2d path costs on this host (reference hot loop
    ``train.py:76-129`` + ``image.py:46-127`` in DataLoader workers).
    """
    from singleshotpose_tpu.data.pipeline import PoseDataset, Loader
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_single

    base = TRAIN_BASE
    _gen_eval_dataset(base, EVAL_FRAMES, masks=True)
    net = yolo_pose_single()
    state = init_train_state(*net.init_params(jax.random.PRNGKey(0)))
    step = make_train_step(net, RegionLossConfig.single(),
                           weight_decay=0.0005 * batch, momentum=0.9,
                           compute_dtype=jnp.bfloat16,
                           fused_stem=jax.default_backend() == "tpu")
    ds = PoseDataset(f"{base}/test.txt", train=True,
                     bg_file_names=[f"{base}/bg.jpg"])

    # One Loader reused for the warm and the timed epoch (the HBM bank build
    # costs ~18 s; rebuilding per epoch would dominate). Carrying rng/seen
    # across epochs is only shape-safe because schedule=None pins a single
    # fixed shape — a multi-scale schedule would recompile mid-measurement.
    loader = Loader(ds, batch, schedule=None, fixed_shape=(SIZE, SIZE),
                    num_workers=0, seed=0, backend="device_bank")

    def epoch(state):
        n = 0
        for images, labels in loader:   # device arrays; dispatch is async
            state, stats = step(state, images, labels,
                                np.float32(1e-4), np.int32(100))
            n += batch
        int(jax.device_get(state.seen))         # real sync
        return state, n

    state, _ = epoch(state)             # warm: bank build + compile
    t0 = time.perf_counter()
    state, n = epoch(state)
    dt = time.perf_counter() - t0
    return n / dt


def bench_loader_scaling(workers=(1, 2, 4, 8), batch: int = 32,
                         min_seconds: float = 2.5) -> dict:
    """Host-loader worker scaling: native decode+augment frames/s at
    1/2/4/8 pool threads (no device in the loop).

    Each level drives the full train-mode path — JPEG decode, mask decode,
    background composite, crop/jitter/HSV — through the C++ thread pool
    (``native/ssp_native.cpp``) and counts emitted frames.  Published next
    to ``loader_host_cores`` because the curve's ceiling is the host:
    on this 1-core dev host the levels should be FLAT (that flatness is the
    evidence the pool adds no serialization overhead); on an n-core TPU VM
    the same bench produces the real scaling curve.  Turns the single-core
    "~575 fps/core decode" claim (docs/design.md §8b) into a measured curve.
    """
    from singleshotpose_tpu.data.pipeline import Loader, PoseDataset

    base = TRAIN_BASE
    _gen_eval_dataset(base, EVAL_FRAMES, masks=True)
    out = {"loader_host_cores": len(os.sched_getaffinity(0))
           if hasattr(os, "sched_getaffinity") else os.cpu_count()}
    for w in workers:
        ds = PoseDataset(f"{base}/test.txt", train=True,
                         bg_file_names=[f"{base}/bg.jpg"])
        loader = Loader(ds, batch, schedule=None, fixed_shape=(SIZE, SIZE),
                        num_workers=w, seed=0, out_uint8=True,
                        backend="native")
        for _, labels in loader:        # warm: page cache + pool spin-up
            pass
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < min_seconds:
            for _, labels in loader:
                n += len(labels)
        out[f"loader_fps_w{w}"] = round(n / (time.perf_counter() - t0), 1)
    return out


def _gen_eval_dataset(base: str, n: int, masks: bool = False) -> str:
    """LINEMOD-format synthetic eval set: 640×480 JPEG frames (smooth content
    so decode cost resembles real photos), labels, mesh, .data config.

    Idempotent: if a previous bench in this run already generated the same
    dataset at ``base`` (same frame count, masks present when requested),
    reuse it instead of re-rendering n JPEGs."""
    from PIL import Image
    datapath = f"{base}/synth.data"
    try:
        with open(f"{base}/test.txt") as f:
            lines = [ln for ln in f.read().splitlines() if ln]
        if (len(lines) == n and os.path.exists(datapath)
                and all(os.path.exists(p) for p in lines[:2])
                and (not masks or os.path.exists(
                    lines[0].replace("JPEGImages", "mask")
                            .replace("/00", "/").replace(".jpg", ".png")))):
            return datapath
    except OSError:
        pass
    rng = np.random.RandomState(5)
    dirs = ("JPEGImages", "labels") + (("mask",) if masks else ())
    for d in dirs:
        os.makedirs(f"{base}/obj/{d}", exist_ok=True)
    K = np.array([[572.4114, 0, 325.2611], [0, 573.5704, 242.0489],
                  [0, 0, 1]], np.float32)
    pts = np.array([[0, 0, 0]] + [[sx * .045, sy * .035, sz * .04]
                    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                   np.float32)
    yy, xx = np.mgrid[0:480, 0:640]
    paths = []
    for i in range(n):
        w = rng.randn(3) * .5
        th = np.linalg.norm(w)
        Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = np.eye(3) + np.sin(th) / th * Kx + \
            (1 - np.cos(th)) / th ** 2 * Kx @ Kx
        t = np.array([rng.uniform(-.06, .06), rng.uniform(-.05, .05),
                      rng.uniform(.6, .8)])
        cam = pts @ R.T + t
        pix = cam @ K.T
        pix = pix[:, :2] / pix[:, 2:3]
        img = np.stack([(xx / 640 * 180 + 40 + 20 * np.sin(i)),
                        (yy / 480 * 160 + 50), np.full_like(xx, 90.0)],
                       axis=-1).astype(np.uint8)
        x0, y0 = int(pix[0, 0]) - 40, int(pix[0, 1]) - 40
        img[max(y0, 0):y0 + 80, max(x0, 0):x0 + 80] = (200, 120, 60)
        name = f"00{i:04d}"
        Image.fromarray(img).save(f"{base}/obj/JPEGImages/{name}.jpg",
                                  quality=85)
        if masks:
            m = np.zeros((480, 640), np.uint8)
            m[max(y0, 0):y0 + 80, max(x0, 0):x0 + 80] = 255
            # mask path rule: JPEGImages→mask, /00→/ (image.py:131)
            Image.fromarray(m).save(f"{base}/obj/mask/{name[2:]}.png")
        lab = np.zeros(21, np.float32)
        lab[1:19:2] = pix[:, 0] / 640
        lab[2:19:2] = pix[:, 1] / 480
        lab[19:21] = [np.ptp(pix[:, 0]) / 640, np.ptp(pix[:, 1]) / 480]
        np.savetxt(f"{base}/obj/labels/{name}.txt", lab[None])
        paths.append(f"{base}/obj/JPEGImages/{name}.jpg")
    with open(f"{base}/test.txt", "w") as f:
        f.write("\n".join(paths) + "\n")
    if masks:   # one VOC-stand-in background for the train path
        Image.fromarray((yy % 256).astype(np.uint8)[..., None].repeat(
            3, axis=-1)).save(f"{base}/bg.jpg", quality=85)
    v = pts[1:]
    ply = ["ply", "format ascii 1.0", f"element vertex {len(v)}",
           "property float x", "property float y", "property float z",
           "element face 0", "property list uchar int vertex_indices",
           "end_header"] + [f"{a} {b} {c}" for a, b, c in v]
    with open(f"{base}/obj.ply", "w") as f:
        f.write("\n".join(ply) + "\n")
    data = (f"valid = {base}/test.txt\nbackup = {base}/backup\n"
            f"mesh = {base}/obj.ply\nname = synth\ndiam = 0.107\n"
            "width = 640\nheight = 480\nfx = 572.4114\nfy = 573.5704\n"
            "u0 = 325.2611\nv0 = 242.0489\n")
    with open(f"{base}/synth.data", "w") as f:
        f.write(data)
    return f"{base}/synth.data"


# keypoint colors for the learnable dataset: widely separated so the HSV
# augmentation jitter cannot confuse keypoint identities
_KP_COLORS = np.array([
    (255, 60, 60), (60, 255, 60), (80, 80, 255), (255, 255, 60),
    (255, 60, 255), (60, 255, 255), (255, 150, 40), (150, 60, 255),
    (240, 240, 240)], np.uint8)


def _gen_learnable_dataset(base: str, n_train: int, n_eval: int,
                           seed: int = 5) -> str:
    """LINEMOD-format synthetic set whose pose IS visually observable: the 9
    projected keypoints are drawn as distinct-colored disks on a dark card,
    so a conv net can genuinely regress held-out poses (unlike
    ``_gen_eval_dataset``, whose frames only encode the centroid — fine for
    timing, vacuous for accuracy).  Writes train/test splits; the training
    background equals the eval frames' background so the two input
    distributions (BN statistics included) match."""
    from PIL import Image
    if os.path.exists(f"{base}/synth.data"):
        return f"{base}/synth.data"
    rng = np.random.RandomState(seed)
    for d in ("JPEGImages", "labels", "mask"):
        os.makedirs(f"{base}/obj/{d}", exist_ok=True)
    K = np.array([[572.4114, 0, 325.2611], [0, 573.5704, 242.0489],
                  [0, 0, 1]], np.float32)
    pts = np.array([[0, 0, 0]] + [[sx * .045, sy * .035, sz * .04]
                    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                   np.float32)
    yy, xx = np.mgrid[0:480, 0:640]
    bgimg = np.stack([(xx / 640 * 120 + 40), (yy / 480 * 120 + 50),
                      np.full_like(xx, 90.0)], axis=-1).astype(np.uint8)
    paths = []
    for i in range(n_train + n_eval):
        w = rng.randn(3) * .5
        th = max(np.linalg.norm(w), 1e-6)
        Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = np.eye(3) + np.sin(th) / th * Kx + \
            (1 - np.cos(th)) / th ** 2 * Kx @ Kx
        t = np.array([rng.uniform(-.06, .06), rng.uniform(-.05, .05),
                      rng.uniform(.6, .8)])
        cam = pts @ R.T + t
        pix = cam @ K.T
        pix = pix[:, :2] / pix[:, 2:3]
        img = bgimg.copy()
        x0 = int(max(pix[:, 0].min() - 10, 0))
        x1 = int(min(pix[:, 0].max() + 10, 640))
        y0 = int(max(pix[:, 1].min() - 10, 0))
        y1 = int(min(pix[:, 1].max() + 10, 480))
        m = np.zeros((480, 640), np.uint8)
        m[y0:y1, x0:x1] = 255
        img[y0:y1, x0:x1] = (30, 30, 30)
        for k in range(9):
            cx, cy = int(pix[k, 0]), int(pix[k, 1])
            d = ((xx - cx) ** 2 + (yy - cy) ** 2) <= 25
            img[d] = _KP_COLORS[k]
        name = f"00{i:04d}"
        Image.fromarray(img).save(f"{base}/obj/JPEGImages/{name}.jpg",
                                  quality=92)
        Image.fromarray(m).save(f"{base}/obj/mask/{name[2:]}.png")
        lab = np.zeros(21, np.float32)
        lab[1:19:2] = pix[:, 0] / 640
        lab[2:19:2] = pix[:, 1] / 480
        lab[19:21] = [np.ptp(pix[:, 0]) / 640, np.ptp(pix[:, 1]) / 480]
        np.savetxt(f"{base}/obj/labels/{name}.txt", lab[None])
        paths.append(f"{base}/obj/JPEGImages/{name}.jpg")
    Image.fromarray(bgimg).save(f"{base}/bg.jpg", quality=92)
    with open(f"{base}/train.txt", "w") as f:
        f.write("\n".join(paths[:n_train]) + "\n")
    with open(f"{base}/test.txt", "w") as f:
        f.write("\n".join(paths[n_train:]) + "\n")
    v = pts[1:]
    ply = ["ply", "format ascii 1.0", f"element vertex {len(v)}",
           "property float x", "property float y", "property float z",
           "element face 0", "property list uchar int vertex_indices",
           "end_header"] + [f"{a} {b} {c}" for a, b, c in v]
    with open(f"{base}/obj.ply", "w") as f:
        f.write("\n".join(ply) + "\n")
    with open(f"{base}/synth.data", "w") as f:
        f.write(f"train = {base}/train.txt\nvalid = {base}/test.txt\n"
                f"backup = {base}/backup\nmesh = {base}/obj.ply\n"
                "name = synth\ndiam = 0.107\nwidth = 640\nheight = 480\n"
                "fx = 572.4114\nfy = 573.5704\nu0 = 325.2611\nv0 = 242.0489\n")
    return f"{base}/synth.data"


def _gen_shaded_dataset(base: str, n_train: int, n_eval: int,
                        seed: int = 11, n_splats: int = 2200) -> str:
    """LINEMOD-format shaded-render set (data/shaded.py): depth-buffered,
    face-colored, Lambertian-lit box at DISJOINT train/test poses.  Unlike
    the keypoint-disk canary (``_gen_learnable_dataset``), the pose is NOT
    painted into the image — the net must read it from projected geometry,
    face visibility, and shading, the cue structure of real LINEMOD.  A
    fixed background is shared by the renderer and the train-path composite
    (``bg.jpg``) so train/eval input distributions (BN statistics included)
    match."""
    from PIL import Image

    from singleshotpose_tpu.data.shaded import PTS, render_frame
    if os.path.exists(f"{base}/synth.data"):
        return f"{base}/synth.data"
    rng = np.random.RandomState(seed)
    for d in ("JPEGImages", "labels", "mask"):
        os.makedirs(f"{base}/obj/{d}", exist_ok=True)
    yy, xx = np.mgrid[0:480, 0:640]
    bgimg = np.stack([(xx / 640 * 60 + 25), (yy / 480 * 60 + 30),
                      np.full_like(xx, 45.0)], axis=-1).astype(np.uint8)
    colors = rng.randint(60, 255, (6, 3))
    paths = []
    for i in range(n_train + n_eval):
        # denser splats than the renderer default: solid surfaces and clean
        # edges (photographic-like), keeping the task honest — pose still
        # only readable from projected geometry + shading
        img, m, lab, _, _ = render_frame(rng, colors, bg_level=None,
                                         n_splats=n_splats)
        img = np.where(m[..., None] > 0, img, bgimg)
        name = f"00{i:04d}"
        Image.fromarray(img).save(f"{base}/obj/JPEGImages/{name}.jpg",
                                  quality=92)
        Image.fromarray(m).save(f"{base}/obj/mask/{name[2:]}.png")
        np.savetxt(f"{base}/obj/labels/{name}.txt", lab[None])
        paths.append(f"{base}/obj/JPEGImages/{name}.jpg")
    Image.fromarray(bgimg).save(f"{base}/bg.jpg", quality=92)
    with open(f"{base}/train.txt", "w") as f:
        f.write("\n".join(paths[:n_train]) + "\n")
    with open(f"{base}/test.txt", "w") as f:
        f.write("\n".join(paths[n_train:]) + "\n")
    v = PTS[1:]
    ply = ["ply", "format ascii 1.0", f"element vertex {len(v)}",
           "property float x", "property float y", "property float z",
           "element face 0", "property list uchar int vertex_indices",
           "end_header"] + [f"{a} {b} {c}" for a, b, c in v]
    with open(f"{base}/obj.ply", "w") as f:
        f.write("\n".join(ply) + "\n")
    diam = float(2 * np.linalg.norm([.045, .035, .04]))
    with open(f"{base}/synth.data", "w") as f:
        f.write(f"train = {base}/train.txt\nvalid = {base}/test.txt\n"
                f"backup = {base}/backup\nmesh = {base}/obj.ply\n"
                f"name = shaded\ndiam = {diam:.4f}\nwidth = 640\n"
                "height = 480\nfx = 572.4114\nfy = 573.5704\n"
                "u0 = 325.2611\nv0 = 242.0489\n")
    return f"{base}/synth.data"


def bench_acc_shaded(n_train: int = 1024, n_eval: int = 512,
                     n_epochs: int = 250, batch: int = 64,
                     seed: int = 0) -> dict:
    """Held-out-pose generalization on shaded renders — the headline
    accuracy evidence (VERDICT r4 #5) standing in for real LINEMOD
    (environment-blocked; metric definitions ``valid.py:203-209``).

    Trains the FULL yolo-pose net once (augmented device_bank pipeline, the
    two-phase darknet recipe) on ``n_train`` shaded frames, then runs the
    complete eval suite on ``n_eval`` frames at DISJOINT poses, twice: bf16
    folded and int8-quantized serving.  Reports all three reference metrics
    per dtype.  The pose here must be inferred from projected box geometry
    + per-face shading — the keypoint-disk canary (``bench_int8_acc``,
    retired to a fast int8 regression check) literally paints it."""
    from singleshotpose_tpu.data.pipeline import Loader, PoseDataset
    from singleshotpose_tpu.drivers import run_validation
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_single

    base = f"/tmp/ssp_bench_shaded_{n_train}_{n_eval}"
    datacfg = _gen_shaded_dataset(base, n_train, n_eval)
    net = yolo_pose_single(test_size=SIZE)
    cfg = RegionLossConfig.single(pretrain_num_epochs=15)
    step = make_train_step(net, cfg, weight_decay=0.0, momentum=0.9,
                           fused_stem=jax.default_backend() == "tpu")
    ds = PoseDataset(f"{base}/train.txt", train=True,
                     bg_file_names=[f"{base}/bg.jpg"])
    state = init_train_state(*net.init_params(jax.random.PRNGKey(seed)))
    loader = Loader(ds, batch, schedule=None, fixed_shape=(SIZE, SIZE),
                    num_workers=0, seed=seed, backend="device_bank")
    for ep in range(n_epochs):
        # from-scratch recipe (no ImageNet init exists here, unlike the
        # reference's darknet19 backbone): conf-pretrain gate for the first
        # 20%, short warmup, then a 3-step decay.  lr is the per-sample
        # effective rate (make_train_step convention): 2.5e-5 ≈ the darknet
        # 0.001/batch rule at b64 — 1.2e-4 was measured to diverge (NaN)
        epoch_flag = 0 if ep < n_epochs * 0.2 else 100
        frac = ep / n_epochs
        lr = 2.5e-5 if frac < 0.6 else (5e-6 if frac < 0.88 else 1e-6)
        if ep < 3:
            lr = 5e-6
        for imgs, labels in loader:
            state, _stats = step(state, imgs, labels, np.float32(lr),
                                 np.int32(epoch_flag))
    kw = dict(params=state.params, batch_stats=state.batch_stats,
              batch_size=64, num_workers=2, verbose=False)
    s_bf16 = run_validation(datacfg, net, **kw)
    s_int8 = run_validation(datacfg, net, quantize=True, **kw)
    return {
        "acc2d5px_shaded_bf16": round(float(s_bf16["acc_2d_proj"]), 2),
        "acc2d5px_shaded_int8": round(float(s_int8["acc_2d_proj"]), 2),
        "acc_add01d_shaded_bf16": round(float(s_bf16["acc_add_0.1d"]), 2),
        "acc_add01d_shaded_int8": round(float(s_int8["acc_add_0.1d"]), 2),
        "acc_5cm5deg_shaded_bf16": round(float(s_bf16["acc_5cm5deg"]), 2),
        "acc_5cm5deg_shaded_int8": round(float(s_int8["acc_5cm5deg"]), 2),
        "px_err_shaded_bf16": round(float(s_bf16["mean_err_2d"]), 3),
        "px_err_shaded_int8": round(float(s_int8["mean_err_2d"]), 3),
        "shaded_eval_n": int(s_bf16["n_samples"]),
    }


def bench_int8_acc(n_train: int = 192, n_eval: int = 256,
                   n_epochs: int = 300, batch: int = 32,
                   seeds: tuple = (0, 1, 2)) -> dict:
    """int8 accuracy evidence on REAL trained nets with a held-out split.

    For each training seed: trains yolo-pose (full net, augmented pipeline,
    device_bank loader) on the learnable synthetic set until held-out mean
    reprojection error is well under the 5 px metric threshold (~2.5-4 px at
    300 epochs), then runs the full eval suite twice — bf16 folded vs
    int8-quantized serving (models/quantize.py) — on the ``n_eval`` held-out
    frames.  Reports the MEAN across seeds plus the min..max spread of the
    deltas, so the README's "2D-reproj@5px unchanged" claim (reference
    metric definition ``valid.py:203-205``) carries noise bars: at n=256
    one frame is 0.39pp, and the spread shows seed-to-seed variation
    (round 3's single-seed n=64 number was exactly one frame flipping).
    """
    from singleshotpose_tpu.data.pipeline import Loader, PoseDataset
    from singleshotpose_tpu.drivers import run_validation
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_single

    base = f"/tmp/ssp_bench_int8_{n_train}_{n_eval}"
    datacfg = _gen_learnable_dataset(base, n_train, n_eval)
    net = yolo_pose_single(test_size=SIZE)
    cfg = RegionLossConfig.single(pretrain_num_epochs=15)
    step = make_train_step(net, cfg, weight_decay=0.0, momentum=0.9,
                           fused_stem=jax.default_backend() == "tpu")
    ds = PoseDataset(f"{base}/train.txt", train=True,
                     bg_file_names=[f"{base}/bg.jpg"])
    accs_bf16, accs_int8, d_acc, d_px = [], [], [], []
    for seed in seeds:
        state = init_train_state(*net.init_params(jax.random.PRNGKey(seed)))
        loader = Loader(ds, batch, schedule=None, fixed_shape=(SIZE, SIZE),
                        num_workers=0, seed=seed, backend="device_bank")
        for ep in range(n_epochs):
            # phase 1: coordinates only (pretrain gate); phase 2:
            # + confidence; final quarter: lr decay (the darknet two-phase
            # recipe, examples/overfit_validation.py)
            epoch_flag = 0 if ep < n_epochs * 0.5 else 100
            lr = 2e-5 if ep < n_epochs * 0.75 else 4e-6
            for imgs, labels in loader:
                state, _stats = step(state, imgs, labels, np.float32(lr),
                                     np.int32(epoch_flag))
        kw = dict(params=state.params, batch_stats=state.batch_stats,
                  batch_size=batch, num_workers=2, verbose=False)
        s_bf16 = run_validation(datacfg, net, **kw)
        s_int8 = run_validation(datacfg, net, quantize=True, **kw)
        accs_bf16.append(float(s_bf16["acc_2d_proj"]))
        accs_int8.append(float(s_int8["acc_2d_proj"]))
        d_acc.append(float(s_int8["acc_2d_proj"] - s_bf16["acc_2d_proj"]))
        d_px.append(float(s_int8["mean_err_2d"] - s_bf16["mean_err_2d"]))
    return {
        "acc2d5px_bf16": round(float(np.mean(accs_bf16)), 2),
        "acc2d5px_int8": round(float(np.mean(accs_int8)), 2),
        "int8_acc_delta": round(float(np.mean(d_acc)), 2),
        "int8_acc_delta_range": [round(min(d_acc), 2), round(max(d_acc), 2)],
        "int8_px_delta": round(float(np.mean(d_px)), 3),
        "int8_px_delta_range": [round(min(d_px), 3), round(max(d_px), 3)],
        "int8_eval_n": len(seeds) * n_eval,
        "int8_seeds": len(seeds),
    }


def _shaded_scene_bank(nf: int, palettes, extents, seed: int = 3):
    """A REAL shaded-render scene bank: 13 classes × ``nf`` single-object
    frames (per-class palette + box geometry, masks from the renderer),
    assembled into the device_synth ``DeviceSceneBank`` layout — the same
    corpus role LINEMOD singles play for the OCCLUSION trainer."""
    from singleshotpose_tpu.data.device_synth import DeviceSceneBank
    from singleshotpose_tpu.data.shaded import render_frame
    from singleshotpose_tpu.data.synth_multi import (ADD_OBJS,
                                                     OCCLUSION_CLASSES)

    rng = np.random.RandomState(seed)
    N = 13 * nf
    imgs = np.zeros((N, 480, 640, 3), np.uint8)
    masks = np.zeros((N, 480, 640), np.uint8)
    labels = np.zeros((N, 21), np.float32)
    for c in range(13):
        for j in range(nf):
            i = c * nf + j
            img, m, lab, _, _ = render_frame(
                rng, palettes[c], n_splats=2200, bg_level=(20, 90),
                ext=tuple(extents[c]), cls=c)
            imgs[i], masks[i], labels[i] = img, m, lab
    comp = np.full((14, 8), -1, np.int32)
    cls_of = {o: i for i, o in enumerate(OCCLUSION_CLASSES)}
    for obj, names in ADD_OBJS.items():
        for j, nme in enumerate(names):
            comp[cls_of[obj], j] = cls_of[nme]
    yy, xx = np.mgrid[0:480, 0:640]
    bgs = np.stack([np.stack(
        [(xx / 640 * 60 + rng.randint(10, 50)),
         (yy / 480 * 60 + rng.randint(10, 50)),
         np.full_like(xx, float(rng.randint(20, 70)))],
        axis=-1).astype(np.uint8) for _ in range(16)])
    bank = DeviceSceneBank(
        imgs, masks, labels, (np.arange(13) * nf).astype(np.int32),
        np.full(13, nf, np.int32), comp, bgs,
        np.arange(N, dtype=np.int32),
        np.repeat(np.arange(13), nf).astype(np.int32))
    return bank.device_put(), N


def bench_acc_shaded_multi(nf: int = 160, n_eval: int = 64,
                           steps: int = 9000, batch: int = 32,
                           seed: int = 0, chunk: int = 150) -> dict:
    """Held-out-scene generalization for the MULTI-OBJECT family — the
    OCCLUSION-protocol analogue of :func:`bench_acc_shaded` (reference
    metric: ``multi_obj_pose_estimation/valid_multi.py:153-158``).

    Protocol-faithful to the reference: training scenes are synthesized
    FRESH every batch by the on-device scene-synthesis pipeline
    (``data/device_synth.py`` — the path ``--loader_backend device_synth``
    serves) from a corpus of 13×``nf`` single-object shaded renders
    (per-class face palettes + per-class box geometry), exactly as the
    OCCLUSION trainer composes scenes from LINEMOD singles.  Evaluation is
    on ``n_eval`` UNSEEN scenes rendered with true 3D occlusion (one global
    z-sorted painter, ``data/shaded.py:render_scene_multi``) — a
    synthesize-train → coherent-scene-eval domain gap mirroring the
    reference's synthesize-train → real-photo-eval protocol.  Scores
    class-picked boxes bf16 folded AND int8 with per-class PnP metrics.
    Complements ``bench_int8_acc_multi`` (fast overfit canary) with a
    generalizing-net number.
    """
    from singleshotpose_tpu.data.augment import resize_nearest
    from singleshotpose_tpu.data.device_synth import (DeviceSynthStatic,
                                                      _synthesize_one)
    from singleshotpose_tpu.data.shaded import box_points, render_scene_multi
    from singleshotpose_tpu.drivers import loss_config_from_spec
    from singleshotpose_tpu.evaluate import EvalContext, pose_metrics
    from singleshotpose_tpu.models.darknet import fold_batchnorm
    from singleshotpose_tpu.models.quantize import (apply_quantized,
                                                    calibrate_activations,
                                                    quantize_folded)
    from singleshotpose_tpu.ops.decode import best_box_for_class, decode_grid
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_multi

    K = np.array([[572.4114, 0, 325.2611], [0, 573.5704, 242.0489],
                  [0, 0, 1]], np.float32)
    base_ext = np.array([.045, .035, .04], np.float32)
    gen_rng = np.random.RandomState(11)
    palettes = gen_rng.randint(60, 255, (13, 6, 3))
    extents = np.stack([base_ext * f for f in np.linspace(0.7, 1.3, 13)])

    def scenes(n, rng):
        imgs = np.zeros((n, SIZE, SIZE, 3), np.uint8)
        gts = []
        for i in range(n):
            img, g = render_scene_multi(
                rng, palettes, extents, rng.choice(13, 3, replace=False))
            imgs[i] = resize_nearest(img, SIZE, SIZE)
            gts.append([(cls, pix) for cls, _lab, pix in g])
        return imgs, gts
    eimgs, egts = scenes(n_eval, np.random.RandomState(seed + 900))

    bank, NB = _shaded_scene_bank(nf, palettes, extents)
    st = DeviceSynthStatic(propose_scale=4)
    net = yolo_pose_multi()
    state = init_train_state(*net.init_params(jax.random.PRNGKey(seed)))
    cfg = loss_config_from_spec(net, pretrain_num_epochs=15,
                                im_width=640, im_height=480, multi=True)
    raw_step = make_train_step(net, cfg, weight_decay=0.0, momentum=0.9,
                               compute_dtype=jnp.bfloat16, donate=False,
                               jit_compile=False,
                               fused_stem=jax.default_backend() == "tpu")

    @partial(jax.jit, static_argnames=("iters",), donate_argnums=(0,))
    def chained(state, bank, key, lr, epoch_flag, iters):
        # bank is an ARGUMENT, not a closure capture: closed-over it would
        # bake 2.6 GB of constants into the compile payload
        def body(i, carry):
            state, idx = carry
            keys = jax.random.split(jax.random.fold_in(key, i), batch)
            rows = jnp.take(bank.base_index, idx)
            cls = jnp.take(bank.base_class, idx)
            imgs, labels = jax.vmap(partial(
                _synthesize_one, bank, out_w=SIZE, out_h=SIZE, st=st))(
                    rows, cls, keys)
            state, _stats = raw_step(state, imgs, labels, lr, epoch_flag)
            return state, (idx + batch) % NB
        state, _ = jax.lax.fori_loop(
            0, iters, body, (state, jnp.arange(batch, dtype=jnp.int32)))
        return state

    chunk = min(chunk, steps)
    for it0 in range(0, steps, chunk):
        frac = it0 / steps
        # same per-sample-rate ladder as the single-object shaded recipe
        lr = 2.5e-5 if frac < 0.6 else (5e-6 if frac < 0.88 else 1e-6)
        if it0 == 0:
            lr = 5e-6                        # warmup chunk
        epoch_flag = 0 if frac < 0.2 else 100
        state = chained(state, bank,
                        jax.random.fold_in(jax.random.PRNGKey(seed), it0),
                        jnp.float32(lr), jnp.int32(epoch_flag), chunk)
    int(jax.device_get(state.seen))

    folded = fold_batchnorm(net, state.params, state.batch_stats)
    eimgs_d = jax.device_put(jnp.asarray(eimgs, jnp.float32) / 255.0)

    ctxs = {c: EvalContext(
        box_points(extents[c]),
        np.concatenate([box_points(extents[c])[1:].T,
                        np.ones((1, 8), np.float32)]),
        K, float(2 * np.linalg.norm(extents[c])), 640, 480)
        for c in range(13)}

    def metrics(head):
        decoded = decode_grid(head.astype(jnp.float32), 9, 13, 5)
        by_cls = {}
        for b in range(len(egts)):
            for cls, pix_gt in egts[b]:
                box = np.asarray(best_box_for_class(decoded, cls, 0.05))[b]
                by_cls.setdefault(cls, []).append(
                    (pix_gt, box[:18].reshape(9, 2) * [640, 480]))
        errs = []
        for cls, pairs in by_cls.items():
            gt = np.stack([p[0] for p in pairs]).astype(np.float32)
            pr = np.stack([p[1] for p in pairs]).astype(np.float32)
            m = pose_metrics(gt, pr, ctxs[cls])
            errs.extend(np.atleast_1d(m["err_2d"]).tolist())
        errs = np.asarray(errs)
        return (100.0 * float((errs <= 5).mean()),
                100.0 * float((errs <= 10).mean()), float(errs.mean()))

    a5_b, a10_b, px_b = metrics(
        net.apply_folded(folded, eimgs_d, compute_dtype=jnp.bfloat16))
    amax = calibrate_activations(net, folded, eimgs_d[:16], per_channel=True)
    qparams = quantize_folded(net, folded, amax)
    a5_q, a10_q, px_q = metrics(apply_quantized(net, qparams, eimgs_d))
    return {
        "acc2d5px_multi_shaded_bf16": round(a5_b, 2),
        "acc2d5px_multi_shaded_int8": round(a5_q, 2),
        "acc2d10px_multi_shaded_bf16": round(a10_b, 2),
        "acc2d10px_multi_shaded_int8": round(a10_q, 2),
        "px_err_multi_shaded_bf16": round(px_b, 3),
        "px_err_multi_shaded_int8": round(px_q, 3),
        "multi_shaded_eval_n": int(sum(len(g) for g in egts)),
    }


def bench_int8_acc_multi(n_scenes: int = 16, iters: int = 900) -> dict:
    """Multi-object int8 delta: the quantized OCCLUSION-style sweep.

    Trains yolo-pose-multi (5 anchors, 13 classes, CE class loss) to fit
    ``n_scenes`` synthetic 3-object scenes whose poses are visually encoded
    (face-colored boxes, the examples/overfit_validation_multi.py
    construction), then decodes per-GT class-picked boxes twice — bf16
    folded vs int8-quantized (models/quantize.py) — and reports the
    2D-reproj@5px delta over the 3·n_scenes object instances.  An
    overfit-net canary (the multi synthesis pipeline has no held-out
    real data in this environment), complementing the generalizing-net
    single-object evidence of :func:`bench_int8_acc`; the eval path is the
    one ``ssp valid-multi --quantize`` serves (reference sweep:
    ``multi_obj_pose_estimation/valid_multi.py:153-158``).
    """
    from singleshotpose_tpu.data.augment import resize_nearest
    from singleshotpose_tpu.evaluate import EvalContext, pose_metrics
    from singleshotpose_tpu.models.darknet import fold_batchnorm
    from singleshotpose_tpu.models.quantize import (calibrate_activations,
                                                    quantize_folded,
                                                    apply_quantized)
    from singleshotpose_tpu.ops.decode import best_box_for_class, decode_grid
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from singleshotpose_tpu.zoo import yolo_pose_multi

    rng = np.random.RandomState(7)
    K = np.array([[572.4114, 0, 325.2611], [0, 573.5704, 242.0489],
                  [0, 0, 1]], np.float32)
    pts = np.array([[0, 0, 0]] + [[sx * .045, sy * .035, sz * .04]
                    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                   np.float32)
    B = n_scenes
    imgs = np.zeros((B, SIZE, SIZE, 3), np.float32)
    tgt = np.zeros((B, 50 * 21), np.float32)
    gt_per_img = []
    colors = rng.randint(60, 255, (13, 6, 3))
    for b in range(B):
        canvas = rng.randint(0, 60, (480, 640, 3)).astype(np.uint8)
        tt = tgt[b].reshape(50, 21)
        gts = []
        for slot, cls in enumerate([1, 4, 7]):
            w = rng.randn(3) * .4
            th = max(np.linalg.norm(w), 1e-6)
            Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                           [-w[1], w[0], 0]])
            R = np.eye(3) + np.sin(th) / th * Kx + \
                (1 - np.cos(th)) / th ** 2 * Kx @ Kx
            t = np.array([(-0.15 + 0.15 * slot) + rng.uniform(-.02, .02),
                          rng.uniform(-.04, .04), rng.uniform(.6, .75)])
            cam = pts @ R.T + t
            pix = cam @ K.T
            pix = pix[:, :2] / pix[:, 2:3]
            for _f in range(300):       # paint pose-revealing face texture
                u, v = rng.uniform(-1, 1, 2)
                face = rng.randint(6)
                p = np.array([u * .045, v * .035,
                              (.04 if face == 0 else -.04)]) if face < 2 \
                    else np.array([u * .045, (.035 if face == 2 else -.035),
                                   v * .04]) if face < 4 \
                    else np.array([(.045 if face == 4 else -.045),
                                   u * .035, v * .04])
                c = (R @ p + t)
                px = K @ c
                x, y = int(px[0] / px[2]), int(px[1] / px[2])
                if 0 <= x < 634 and 0 <= y < 474:
                    canvas[y:y + 6, x:x + 6] = colors[cls, face]
            tt[slot, 0] = cls
            tt[slot, 1:19:2] = pix[:, 0] / 640
            tt[slot, 2:19:2] = pix[:, 1] / 480
            tt[slot, 19:21] = [np.ptp(pix[:, 0]) / 640,
                               np.ptp(pix[:, 1]) / 480]
            gts.append((cls, pix.copy()))
        gt_per_img.append(gts)
        imgs[b] = resize_nearest(canvas, SIZE, SIZE).astype(np.float32) / 255.

    net = yolo_pose_multi()
    state = init_train_state(*net.init_params(jax.random.PRNGKey(0)))
    cfg = RegionLossConfig.multi(anchors=net.anchors, pretrain_num_epochs=15)
    step = make_train_step(net, cfg, weight_decay=0.0, momentum=0.9,
                           fused_stem=jax.default_backend() == "tpu")
    imgs_d = jax.device_put(jnp.asarray(imgs))
    tgt_d = jax.device_put(jnp.asarray(tgt))
    for it in range(iters):
        epoch = 0 if it < iters * 0.45 else 100
        state, _ = step(state, imgs_d, tgt_d, np.float32(8e-6),
                        np.int32(epoch))

    folded = fold_batchnorm(net, state.params, state.batch_stats)
    ctx = EvalContext(pts, np.concatenate(
        [pts[1:].T, np.ones((1, 8), np.float32)]), K, 0.107, 640, 480)

    def acc_at_5px(head) -> tuple:
        decoded = decode_grid(head.astype(jnp.float32), 9, 13, 5)
        errs = []
        for b in range(B):
            for cls, pix_gt in gt_per_img[b]:
                box = np.asarray(best_box_for_class(decoded, cls, 0.05))[b]
                pr = box[:18].reshape(9, 2) * [640, 480]
                m = pose_metrics(pix_gt[None].astype(np.float32),
                                 pr[None].astype(np.float32), ctx)
                errs.append(float(np.atleast_1d(m["err_2d"])[0]))
        errs = np.asarray(errs)
        return 100.0 * float((errs <= 5).mean()), float(errs.mean())

    acc_bf16, px_bf16 = acc_at_5px(
        net.apply_folded(folded, imgs_d, compute_dtype=jnp.bfloat16))
    amax = calibrate_activations(net, folded, imgs_d, per_channel=True)
    qparams = quantize_folded(net, folded, amax)
    acc_int8, px_int8 = acc_at_5px(apply_quantized(net, qparams, imgs_d))
    return {
        "acc2d5px_multi_bf16": round(acc_bf16, 2),
        "acc2d5px_multi_int8": round(acc_int8, 2),
        "int8_multi_acc_delta": round(acc_int8 - acc_bf16, 2),
        "int8_multi_px_delta": round(px_int8 - px_bf16, 3),
        "int8_multi_eval_n": 3 * B,
    }


def bench_eval_e2e():
    """End-to-end eval fps: JPEG decode → h2d → forward+decode → batched PnP
    → metric suite (``run_validation`` equivalent), warm pass, for three
    transfer modes: "rgb" (u8 at eval size), "yuv420" (native-size 4:2:0
    planes converted + resized on device — fewest bytes per frame), and
    "bank" (split decoded once into HBM — the steady-state in-training-eval
    cadence, zero per-frame link traffic, so the number is link-insensitive).
    """
    from singleshotpose_tpu.drivers import run_validation
    from singleshotpose_tpu.zoo import yolo_pose_single

    base = "/tmp/ssp_bench_eval"
    datacfg = _gen_eval_dataset(base, EVAL_FRAMES)
    net = yolo_pose_single()
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    kw = dict(params=params, batch_stats=bstats, batch_size=EVAL_BATCH,
              num_workers=2, verbose=False)
    fps = {}
    for transfer in ("rgb", "yuv420", "bank"):
        try:
            run_validation(datacfg, net, transfer=transfer, **kw)  # warm
            times = []
            for _ in range(3):      # median of 3: the shared link is noisy
                t0 = time.perf_counter()
                s = run_validation(datacfg, net, transfer=transfer, **kw)
                times.append(time.perf_counter() - t0)
                assert s["n_samples"] == EVAL_FRAMES
            fps[transfer] = EVAL_FRAMES / sorted(times)[1]
        except (RuntimeError, OSError):
            fps[transfer] = None    # native loader unavailable
    from singleshotpose_tpu.data import eval_bank
    eval_bank.clear_cache()         # release the bank's HBM for later benches
    return fps


def bench_link(mb: int = 64, iters: int = 5):
    """Measured host↔device link throughput (MB/s), h2d and d2h.

    Published next to the e2e eval fps so that number is interpretable: eval
    through a shared tunnel moves with link load (BENCH_r02's 30.9 fps vs a
    73-fps quiet-link run was entirely link).  64 MB ≈ one 48×672² u8 eval
    batch.  Median of ``iters``."""
    buf = np.zeros((mb, 1 << 20), np.uint8)
    jax.block_until_ready(jax.device_put(buf))          # warm path/alloc
    h2d, d2h = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        dev = jax.block_until_ready(jax.device_put(buf))
        h2d.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(dev)
        d2h.append(time.perf_counter() - t0)
    return mb / sorted(h2d)[len(h2d) // 2], mb / sorted(d2h)[len(d2h) // 2]


def _run_synth_group(scale: str = "full") -> dict:
    """The two scene-synthesis numbers. ``scale="small"`` is a degraded
    config (8 frames/object bank, batch 16) that still yields a real
    number when the full-size bank + program peak is what kills the
    TPU worker — a smaller measured value beats a null artifact.
    ``scale="probe"`` is the sacrificial health probe: a miniature run of
    the same code path (int8 one-hot einsums, scan, gathers), cheap enough
    to burn on a fragile worker."""
    if scale == "probe":
        return {"synth_probe_scenes_per_sec": round(
            bench_synth_scenes(batch=2, iters=2, nf=2, attempts=6), 1)}
    if scale == "small":
        return {
            "synth_scenes_per_sec": round(
                bench_synth_scenes(batch=16, iters=8, nf=8), 1),
            "train_multi_e2e_sps": round(
                bench_train_multi_e2e(batch=16, iters=6, nf=8), 1),
        }
    return {"synth_scenes_per_sec": round(bench_synth_scenes(), 1),
            "synth_scenes_per_sec_a6": round(
                bench_synth_scenes(attempts=6), 1),
            "train_multi_e2e_sps": round(bench_train_multi_e2e(), 1)}


def _wait_for_tpu_health(max_wait: float = 150.0, heavy: bool = False) -> bool:
    """Poll (in throwaway subprocesses) until a trivial TPU op succeeds.

    BENCH_r02 showed 3/3 child crashes with 15 s backoffs while the parent —
    connecting ~1 min later — worked fine: the dominant failure mode is a
    TPU worker that is still restarting when the child connects, and a PJRT
    client that touched the dead worker is unusable for the rest of its
    process lifetime.  Probing from a fresh tiny process sidesteps both:
    no heavy compile wasted on a dead worker, no poisoned client.

    ``heavy=True`` adds a second stage: a *sacrificial* miniature synth run
    (``--synth_scale probe``).  Root-cause evidence (round 3): the crash is
    not program-shape or cache-state dependent — the identical full-size
    program crashed the worker on the session's first heavy touch and then
    ran reliably (cold cache included) right after the worker restarted.
    The fragile state is in the worker; a trivial matmul passes through it,
    a real program (scan + gathers + int8 einsums) kills it.  Burning the
    ~30 s probe on a fragile worker converts a lost 5-minute bench attempt
    into a probe retry against the freshly-restarted (now stable) worker.
    """
    probe = ("import jax, jax.numpy as jnp; "
             "jax.block_until_ready(jnp.ones((128, 128)) @ jnp.ones((128, 128)))")
    deadline = time.time() + max_wait
    stage = 0                       # 0 = trivial matmul, 1 = heavy probe
    while True:
        try:
            if stage == 0:
                proc = subprocess.run([sys.executable, "-c", probe],
                                      stdout=subprocess.DEVNULL,
                                      stderr=subprocess.DEVNULL, timeout=120)
            else:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--only",
                     "synth", "--synth_scale", "probe"],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                    timeout=600,
                    cwd=os.path.dirname(os.path.abspath(__file__)))
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            # a HUNG probe (vs a crashed one) is the same signal: the worker
            # is unhealthy — treat as failed so the escalation ladder in
            # _synth_group_in_subprocess keeps its small-scale fallback
            rc = -1
        if rc == 0:
            if stage == 1 or not heavy:
                return True
            stage = 1               # matmul ok → run the sacrificial probe
            continue
        if time.time() > deadline:
            return False
        print(f"# TPU health probe (stage {stage}) failed; "
              "waiting for worker restart...")
        time.sleep(15)
        stage = 0                   # after a crash, start from the cheap probe


def _synth_group_in_subprocess():
    """Run the scene-synthesis benches in a FRESH process (own TPU client).

    Two measured failure modes this guards against: (a) after the b128
    benches the parent's HBM is fragmented enough that the synth bank +
    program peak crashes the TPU worker through the axon plugin
    (``UNAVAILABLE: TPU worker process crashed``); (b) a child sharing the
    chip with an already-live parent client intermittently dies (rc=1).
    Hence main() runs this FIRST, before the parent initializes its own TPU
    client; the persistent compilation cache keeps re-compiles near zero.

    Escalation ladder (each attempt preceded by a fresh-process health
    probe so we never burn an attempt on a still-restarting worker):
    full-size bank ×2, then the degraded small config — a smaller measured
    number still beats a null artifact.  If everything here fails, main()
    falls back to running the group inline in the parent at the end.
    """
    last = ""
    for attempt, (scale, backoff) in enumerate(
            [("full", 0), ("full", 30), ("small", 60)]):
        if attempt:
            print(f"# synth bench retry {attempt} (scale={scale}): {last}")
            time.sleep(backoff)     # let the crashed TPU worker come back
        if not _wait_for_tpu_health(heavy=True):
            last = "health probe never passed"
            continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--only", "synth",
                 "--synth_scale", scale],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                timeout=1800,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            last = "synth subprocess hung (1800s) — treated as crash"
            continue
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("{"):
                out = json.loads(line)["extra"]
                if scale != "full":
                    print(f"# synth group measured at scale={scale}")
                return out
        last = (f"rc={proc.returncode}: "
                + " | ".join(proc.stderr.splitlines()[-3:]))
    raise RuntimeError(f"synth bench subprocess failed after retries, {last}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["infer", "train", "traincost", "synth",
                                       "eval", "int8acc", "shadedacc",
                                       "microbatch", "loader"],
                    default=None, help="run a single group (default: all; "
                    "'synth' runs in a subprocess from the default run)")
    ap.add_argument("--synth_scale", choices=["full", "small", "probe"],
                    default="full", help="bank/batch size for --only synth "
                    "('probe' = sacrificial worker-health probe)")
    args = ap.parse_args()

    extra = {}
    fps = None
    synth_pending = False
    if args.only is None:
        # the synth group runs FIRST, in a clean child process, while this
        # parent has not yet initialized its own TPU client: a child sharing
        # the chip with a live parent client intermittently fails through
        # the axon plugin (observed rc=1 mid-bench; clean-first always works)
        try:
            extra.update(_synth_group_in_subprocess())
        except Exception as e:        # degrade gracefully: a synth-group
            synth_pending = True      # failure must not lose other metrics;
            print(f"# synth bench group failed: {e!r}")   # retried inline
            extra.update({"synth_scenes_per_sec": None,   # at the end
                          "train_multi_e2e_sps": None})
    if args.only in (None, "infer"):
        fps = bench_infer()
        extra["infer_fps_int8"] = round(bench_infer(quantize=True), 1)
        extra["infer_fps_multi"] = round(bench_infer_multi(), 1)
        extra["pnp_poses_per_sec"] = round(bench_pnp(), 1)
        # serving-latency regime: on-device ms for ONE frame's forward+decode
        # (reference "real-time" context: ~20 ms/frame on a Titan X).  The
        # two-point chain fit cancels the tunnel's fixed dispatch round-trip
        # (reported separately) — see bench_latency_b1's docstring.
        lat_bf16, dispatch = bench_latency_b1()
        lat_int8, _ = bench_latency_b1(quantize=True)
        extra["serving_latency_ms_b1"] = round(lat_bf16, 3)
        extra["serving_latency_ms_b1_int8"] = round(lat_int8, 3)
        extra["serving_dispatch_ms"] = round(dispatch, 2)
        try:
            extra.update(bench_microbatch())
        except Exception as e:
            print(f"# microbatch bench failed: {e!r}")
            extra["microbatch_fps_16c"] = None
    if args.only in (None, "train"):
        step_ms, tps = bench_train_step()
        extra["train_step_ms_b8"] = round(step_ms, 2)
        extra["train_samples_per_sec"] = round(tps, 1)
        if jax.default_backend() == "tpu":
            extra["train_step_ms_b8_dp_mesh"] = round(
                bench_train_step_dp_mesh(), 2)
        _, tps128 = bench_train_step(batch=128, chain=8)
        extra["train_sps_b128"] = round(tps128, 1)
        m_ms, _ = bench_train_multi_step()          # reference batch 32
        extra["train_multi_step_ms_b32"] = round(m_ms, 2)
        _, m_tps128 = bench_train_multi_step(batch=128, chain=8)
        extra["train_multi_sps_b128"] = round(m_tps128, 1)
        try:
            extra["train_e2e_sps"] = round(bench_train_e2e(), 1)
        except (RuntimeError, OSError):
            extra["train_e2e_sps"] = None   # native loader unavailable
        try:
            extra["train_e2e_device_bank_sps"] = round(
                bench_train_e2e_device_bank(), 1)
        except (RuntimeError, OSError) as e:
            extra["train_e2e_device_bank_sps"] = None
            print(f"# device_bank bench failed: {e!r}")
        try:
            extra.update(bench_loader_scaling())
        except (RuntimeError, OSError) as e:
            extra["loader_fps_w1"] = None
            print(f"# loader scaling bench failed: {e!r}")
    if args.only in (None, "traincost"):
        try:
            extra.update(bench_train_cost_model())
        except Exception as e:
            print(f"# train cost model failed: {e!r}")
            extra["traincost_full_ms"] = None
    if args.only == "synth":
        extra.update(_run_synth_group(args.synth_scale))
    if args.only == "microbatch":
        extra.update(bench_microbatch())
    if args.only == "loader":
        extra.update(bench_loader_scaling())
    if args.only in (None, "eval"):
        eval_fps = bench_eval_e2e()
        extra["eval_e2e_fps"] = round(eval_fps["rgb"], 1) \
            if eval_fps["rgb"] else None
        extra["eval_e2e_fps_yuv420"] = round(eval_fps["yuv420"], 1) \
            if eval_fps["yuv420"] else None
        extra["eval_e2e_fps_bank"] = round(eval_fps["bank"], 1) \
            if eval_fps.get("bank") else None
        # link context: rgb/yuv420 e2e move with tunnel load; bank does not
        h2d, d2h = bench_link()
        extra["link_h2d_MBps"] = round(h2d, 1)
        extra["link_d2h_MBps"] = round(d2h, 1)
    if args.only in (None, "int8acc", "shadedacc"):
        try:
            extra.update(bench_acc_shaded())
        except Exception as e:
            print(f"# shaded accuracy bench failed: {e!r}")
            extra["acc2d5px_shaded_bf16"] = None
        try:
            extra.update(bench_acc_shaded_multi())
        except Exception as e:
            print(f"# shaded multi accuracy bench failed: {e!r}")
            extra["acc2d5px_multi_shaded_bf16"] = None
    if args.only in (None, "int8acc"):
        try:
            extra.update(bench_int8_acc())
        except Exception as e:
            print(f"# int8 accuracy bench failed: {e!r}")
            extra["int8_acc_delta"] = None
        try:
            extra.update(bench_int8_acc_multi())
        except Exception as e:
            print(f"# int8 multi accuracy bench failed: {e!r}")
            extra["int8_multi_acc_delta"] = None
    if synth_pending:
        # Last resort: run the synth group inline, in THIS parent process.
        # BENCH_r02 proved the parent's client survives the whole run even
        # when the clean-child path crashes 3/3, so an inline attempt after
        # every other number is already collected risks nothing we haven't
        # already banked (a kernel fault surfaces as a catchable
        # JaxRuntimeError at the device_get) and converts a null artifact
        # into a measured one.
        for scale in ("full", "small"):
            try:
                extra.update(_run_synth_group(scale))
                print(f"# synth group ran inline in parent (scale={scale})")
                break
            except Exception as e:
                print(f"# inline synth (scale={scale}) failed: {e!r}")

    if jax.default_backend() == "tpu":
        # MFU (achieved / v5e chip peak) so perf is judged on utilization,
        # not just fps: fwd ≈ 33.4 GFLOP/frame at 416², train step ≈ 3× fwd
        # (fwd + ~2× bwd, the standard estimate for conv nets).
        from singleshotpose_tpu.zoo import yolo_pose_single
        gf = _model_flops_per_frame(yolo_pose_single(), SIZE)
        extra["model_gflops_per_frame_416"] = round(gf / 1e9, 1)
        if fps:
            extra["mfu_infer_bf16"] = round(fps * gf / V5E_PEAK_BF16, 3)
        if extra.get("infer_fps_int8"):
            extra["mfu_infer_int8"] = round(
                extra["infer_fps_int8"] * gf / V5E_PEAK_INT8, 3)
        if extra.get("train_sps_b128"):
            extra["mfu_train_b128"] = round(
                extra["train_sps_b128"] * 3 * gf / V5E_PEAK_BF16, 3)
        if extra.get("train_multi_sps_b128"):
            from singleshotpose_tpu.zoo import yolo_pose_multi
            gf_m = _model_flops_per_frame(yolo_pose_multi(), SIZE)
            extra["mfu_train_multi"] = round(
                extra["train_multi_sps_b128"] * 3 * gf_m / V5E_PEAK_BF16, 3)

    if fps is None:                 # --only train/eval: still one JSON line
        metric, value = next(iter(extra.items()))
        print(json.dumps({"metric": metric, "value": value,
                          "unit": "", "vs_baseline": None, "extra": extra}))
        return
    print(json.dumps({
        "metric": "inference_fps_416_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
