"""Deployable serving artifacts: freeze a trained net into one portable file.

The reference has **no serving layer**: deploying it means shipping the whole
PyTorch training stack and re-tracing ``Darknet(cfgfile)`` + the python
decode loop on every process start (reference ``valid.py:36-57`` builds the
model from cfg + weights before it can serve a single frame).  On TPU the
right deployment unit is the compiled program, so this module exports the
*serving function* — folded-BN bf16 (or int8-PTQ) forward + grid decode +
box pick, the same fused executable the eval driver runs — with
:mod:`jax.export` into a single StableHLO artifact:

  * **self-contained** — the weights are baked in as constants; loading it
    needs jax only, not this package, not the cfg file, not the weights file;
  * **portable** — serialized StableHLO with jax's compatibility guarantees
    (forward/backward windows), optionally lowered for several platforms
    (``platforms=("tpu", "cpu")``) so one artifact serves on TPU and smoke-
    tests on CPU;
  * **batch-polymorphic** (opt-in) — exported with a symbolic batch dim so
    one artifact serves any batch size without retracing.

``aot_serving`` is the in-process variant: ahead-of-time compile the serving
executable (``jit(fn).lower(args).compile()``) so the first request pays
zero compile latency (with ``jax_compilation_cache_dir`` set, even the AOT
compile is a disk hit after the first process).

CLI: ``ssp export --modelcfg ... --weightfile ... --out model.sspx``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .models.darknet import DarknetSpec
from .ops.decode import (best_box_for_class, best_boxes, best_boxes_per_class,
                         decode_grid)

__all__ = ["make_serving_fn", "export_serving", "save_exported",
           "load_serving", "aot_serving", "MicroBatcher"]

# (pick-mode, extras) accepted by make_serving_fn / the eval driver alike:
#   None / ("grid",)            → decoded grid (B, nA·H·W, 2K+3+C)-ish pytree
#   ("best",)                   → (B, 2K+3) best box per image
#   ("per_class", conf)         → (B, C, 2K+3) per-class best with fallback
#   ("for_class", cls, conf)    → (B, 2K+3) best box of one class
Pick = Optional[Tuple]


def _is_quantized(params) -> bool:
    return any(isinstance(v, dict) and "wq" in v for v in params.values())


def make_serving_fn(spec: DarknetSpec, params, *, pick: Pick = None,
                    compute_dtype=jnp.bfloat16):
    """The serving function ``images -> boxes`` with the weights closed over.

    ``params`` is either a folded-BN pytree (:func:`fold_batchnorm`) or an
    int8 pytree (:func:`models.quantize.quantize_folded` /
    ``load_quantized``) — dispatch is by content, same rule as the eval
    driver (``drivers._eval_forward``).  Closing over the weights is what
    makes the exported artifact self-contained: they serialize as StableHLO
    constants.

    ``images``: NHWC, uint8 (normalized on device — the transfer-optimal
    encoding) or float in [0, 1].
    """
    K, C, nA = spec.num_keypoints, spec.num_classes, spec.num_anchors
    quantized = _is_quantized(params)

    def serve(images: jax.Array):
        if jnp.issubdtype(images.dtype, jnp.integer):
            images = images.astype(jnp.float32) / 255.0
        if quantized:
            from .models.quantize import apply_quantized
            head = apply_quantized(spec, params, images,
                                   compute_dtype=compute_dtype)
        else:
            head = spec.apply_folded(params, images,
                                     compute_dtype=compute_dtype)
        decoded = decode_grid(head.astype(jnp.float32), K, C, nA)
        if pick is None or pick[0] == "grid":
            return decoded
        if pick[0] == "best":
            return best_boxes(decoded)
        if pick[0] == "per_class":
            return best_boxes_per_class(decoded, pick[1])
        if pick[0] == "for_class":
            return best_box_for_class(decoded, pick[1], pick[2])
        raise ValueError(f"unknown pick {pick!r}")

    return serve


def export_serving(spec: DarknetSpec, params, *, width: int, height: int,
                   batch: Optional[int] = None, pick: Pick = ("best",),
                   compute_dtype=jnp.bfloat16, input_dtype=jnp.uint8,
                   platforms: Optional[Sequence[str]] = None
                   ) -> jax_export.Exported:
    """Export the serving function to a portable StableHLO artifact.

    Args:
      width, height: serving resolution (must be stride-divisible, like any
        eval size).
      batch: fixed batch size, or ``None`` for a batch-polymorphic export
        (symbolic leading dim — one artifact, any batch size).
      pick: box-pick fused into the artifact (see :data:`Pick`).
      input_dtype: ``uint8`` (default; artifact normalizes internally) or a
        float dtype taking [0, 1] inputs.
      platforms: lowering targets, e.g. ``("tpu", "cpu")``; default is the
        exporting backend only.

    Returns a :class:`jax.export.Exported`; persist with
    :func:`save_exported`.
    """
    serve = jax.jit(make_serving_fn(spec, params, pick=pick,
                                    compute_dtype=compute_dtype))
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        shape: Tuple = (b, height, width, 3)
    else:
        shape = (batch, height, width, 3)
    arg = jax.ShapeDtypeStruct(shape, input_dtype)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(serve, **kwargs)(arg)


def save_exported(path: str, exported: jax_export.Exported) -> None:
    """Serialize an export to one file (StableHLO + weights-as-constants)."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)


def load_serving(path: str):
    """Load a saved artifact → a jitted callable ``images -> boxes``.

    Needs only jax — no package import, cfg, or weight file.  The returned
    callable compiles per concrete input shape (once; the persistent
    compilation cache makes process restarts a disk hit).
    """
    with open(path, "rb") as f:
        data = f.read()
    exported = jax_export.deserialize(bytearray(data))
    return jax.jit(exported.call)


def aot_serving(spec: DarknetSpec, params, *, batch: int, width: int,
                height: int, pick: Pick = ("best",),
                compute_dtype=jnp.bfloat16, input_dtype=jnp.uint8):
    """Ahead-of-time compile the serving executable for one static shape.

    Returns a ``jax.stages.Compiled``: calling it never traces or compiles —
    the first request runs at steady-state latency.  Combine with
    ``jax.config.update("jax_compilation_cache_dir", ...)`` to make even
    this compile a one-time cost per machine.
    """
    serve = jax.jit(make_serving_fn(spec, params, pick=pick,
                                    compute_dtype=compute_dtype))
    arg = jax.ShapeDtypeStruct((batch, height, width, 3), input_dtype)
    return serve.lower(arg).compile()


class MicroBatcher:
    """Dynamic micro-batching front end for a serving function.

    The TPU serving tension: the MXU wants batches (measured 416² bf16:
    ~4,240 fps at batch 128 vs ~1,400 at batch 1 — the per-frame cost drops
    3× with batch), but online requests arrive one at a time.  The standard
    resolution — what every production TPU server does — is a small queue
    that coalesces concurrently-pending requests into one batch, **pads to a
    fixed bucket size** so each bucket is ONE pre-compiled executable (no
    retrace, static shapes — the same bucketing discipline as multi-scale
    training), runs the fused serving function, and fans the per-request
    results back out.  The reference has no serving layer at all (its eval
    loop is bs=1, ``valid.py:100``).

    ``serve_fn``: ``images (B,H,W,3) -> pytree`` with a leading batch dim on
    every leaf — anything from :func:`make_serving_fn` (jitted),
    :func:`aot_serving` per bucket, or :func:`load_serving`.  When given a
    single callable it is used for every bucket; pass a dict
    ``{bucket: fn}`` (e.g. from ``aot_serving``) for zero-compile serving.

    Latency policy: a batch closes when the largest bucket fills OR
    ``max_delay_ms`` has elapsed since its first request — a lone request
    pays at most ``max_delay_ms`` extra, a burst gets MXU-efficient batches.

    Pipelined: the batch thread *dispatches* (JAX dispatch is non-blocking)
    and a resolver thread blocks on results, so batch k+1's host→device
    transfer overlaps batch k's compute — the same async discipline as the
    eval loop (``drivers._eval_pass``).  ``max_in_flight`` bounds queued
    device work (2 = classic double buffering).  Driver-captured numbers
    (``bench.py bench_microbatch`` → ``microbatch_*`` fields in BENCH_r05,
    measured through the dev tunnel — the link-bound WORST case, every
    frame individually crossing a ~40 MB/s link; two captures quoted as
    ranges, the tunnel's load moves between runs): 16 closed-loop clients
    reach 2.7-3.6× the serial batch-1 client (``microbatch_fps_16c``
    61-67 vs ``microbatch_fps_1c`` 17-25), coalescing to
    ``microbatch_mean_bucket`` 8-16 frames per dispatch, with
    client-observed p50/p99 of 229-253/396-459 ms at full 16-client
    saturation (closed-loop latency ≈ clients/throughput —
    the fps, not the latency, is the signal under this load model).  The
    on-device economics the batcher unlocks are larger still: batch-128
    serving is ~3× cheaper per frame than batch-1 (0.24 vs 0.72 ms), the
    realized win when the host link is PCIe instead of this tunnel.

    Thread-safe; use as a context manager or call :meth:`close`.
    """

    _STOP = object()

    def __init__(self, serve_fn, *, height: int, width: int,
                 buckets: Sequence[int] = (1, 2, 4, 8, 16, 32),
                 max_delay_ms: float = 2.0, input_dtype="uint8",
                 max_in_flight: int = 2, start: bool = True):
        import numpy as np
        self._np = np
        self._buckets = tuple(sorted(set(int(b) for b in buckets)))
        if not self._buckets or self._buckets[0] < 1:
            raise ValueError(f"bad buckets {buckets!r}")
        self._fns = (dict(serve_fn) if isinstance(serve_fn, dict)
                     else {b: serve_fn for b in self._buckets})
        missing = [b for b in self._buckets if b not in self._fns]
        if missing:
            raise ValueError(f"no serve_fn for buckets {missing}")
        self._shape = (height, width, 3)
        self._dtype = np.dtype(input_dtype)
        self._max_delay = max_delay_ms / 1e3
        import queue as _queue
        import threading
        self._queue: "_queue.Queue" = _queue.Queue()
        self._inflight: "_queue.Queue" = _queue.Queue(
            maxsize=max(int(max_in_flight), 1))
        self._closed = False
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="ssp-microbatcher")
        self._resolver = threading.Thread(target=self._resolve, daemon=True,
                                          name="ssp-microbatcher-resolver")
        self._started = False
        if start:
            self.start()

    def start(self):
        if not self._started:
            self._started = True
            self._thread.start()
            self._resolver.start()
        return self

    def submit(self, image):
        """Enqueue one frame; returns a ``concurrent.futures.Future`` whose
        result is this frame's slice of the serving output pytree."""
        from concurrent.futures import Future
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        img = self._np.asarray(image, self._dtype)
        if img.shape != self._shape:
            raise ValueError(f"frame shape {img.shape} != {self._shape}")
        fut = Future()
        self._queue.put((img, fut))
        return fut

    def infer(self, image, timeout: Optional[float] = None):
        """Blocking one-frame inference through the batcher."""
        return self.submit(image).result(timeout)

    def _collect(self):
        """One batch: first request blocks; then drain until the largest
        bucket fills or max_delay since the first request elapses."""
        import queue as _queue
        import time
        item = self._queue.get()
        if item is self._STOP:
            return None
        batch = [item]
        deadline = time.monotonic() + self._max_delay
        max_b = self._buckets[-1]
        while len(batch) < max_b:
            remaining = deadline - time.monotonic()
            try:
                item = self._queue.get(
                    timeout=max(remaining, 0) if remaining > 0 else None,
                    block=remaining > 0)
            except _queue.Empty:
                break
            if item is self._STOP:
                self._queue.put(self._STOP)   # re-post for the outer loop
                break
            batch.append(item)
        return batch

    def _worker(self):
        """Collect + DISPATCH only (non-blocking); the resolver thread
        blocks on device results, so the next batch's assembly and h2d
        overlap the current batch's compute."""
        np = self._np
        while True:
            batch = self._collect()
            if batch is None:
                self._inflight.put(self._STOP)
                break
            n = len(batch)
            bucket = next(b for b in self._buckets if b >= n)
            imgs = np.zeros((bucket,) + self._shape, self._dtype)
            for i, (img, _) in enumerate(batch):
                imgs[i] = img
            try:
                out = self._fns[bucket](imgs)     # async dispatch
            except Exception as e:     # noqa: BLE001 — fan the error out
                for _, fut in batch:
                    fut.set_exception(e)
                continue
            self._inflight.put((out, batch))      # bounded: backpressure

    def _resolve(self):
        while True:
            item = self._inflight.get()
            if item is self._STOP:
                break
            out, batch = item
            try:
                host = jax.device_get(out)
            except Exception as e:     # noqa: BLE001 — device-side failure
                for _, fut in batch:
                    fut.set_exception(e)
                continue
            for i, (_, fut) in enumerate(batch):
                fut.set_result(jax.tree.map(lambda a: a[i], host))

    def close(self):
        """Stop accepting requests, drain the queue, join the threads."""
        if self._closed:
            return
        self._closed = True
        self._queue.put(self._STOP)
        if self._started:
            self._thread.join()
            self._resolver.join()
        # reject anything racing close(): fail pending futures loudly
        import queue as _queue
        while True:
            try:
                item = self._queue.get_nowait()
            except _queue.Empty:
                break
            if item is not self._STOP:
                item[1].set_exception(RuntimeError("MicroBatcher closed"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()


def _parse_pick(pick: str, conf_thresh: float, cls: int) -> Pick:
    if pick == "grid":
        return None
    if pick == "best":
        return ("best",)
    if pick == "per_class":
        return ("per_class", conf_thresh)
    if pick == "for_class":
        return ("for_class", cls, conf_thresh)
    raise ValueError(f"unknown pick {pick!r}")


def cmd_export(argv: Sequence[str]) -> int:
    """``ssp export``: darknet weights (or int8 .npz) → one serving file."""
    import argparse

    p = argparse.ArgumentParser(
        prog="ssp export",
        description="freeze a trained net into a portable StableHLO serving "
                    "artifact (weights baked in; loads with jax alone)")
    p.add_argument("--modelcfg", type=str, default="cfg/yolo-pose.cfg")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--weightfile", type=str,
                     help="darknet .weights (BN folded at export)")
    src.add_argument("--quantized", type=str,
                     help="int8 .npz from `ssp quantize` (int8 serving)")
    src.add_argument("--orbax_dir", type=str,
                     help="export from an Orbax full-state checkpoint "
                          "(training → serving with no .weights detour)")
    p.add_argument("--step", type=int, default=None,
                   help="Orbax checkpoint step (default: latest)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--width", type=int, default=544)
    p.add_argument("--height", type=int, default=544)
    p.add_argument("--batch", type=int, default=None,
                   help="fixed batch (default: batch-polymorphic export)")
    p.add_argument("--pick", type=str, default="best",
                   choices=["grid", "best", "per_class", "for_class"])
    p.add_argument("--conf_thresh", type=float, default=0.1)
    p.add_argument("--cls", type=int, default=0,
                   help="class id for --pick for_class")
    p.add_argument("--compute", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--float_input", action="store_true",
                   help="take float [0,1] inputs instead of uint8")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma list, e.g. tpu,cpu (default: this backend)")
    args = p.parse_args(argv)

    from .cli import _resolve_model
    from .drivers import load_spec
    spec = load_spec(_resolve_model(args.modelcfg))
    if args.quantized:
        from .models.quantize import load_quantized
        params = jax.device_put(load_quantized(args.quantized))
    elif args.orbax_dir:
        from .checkpoint import OrbaxCheckpointer
        from .models.darknet import fold_batchnorm
        ckpt = OrbaxCheckpointer(args.orbax_dir)
        state, step = ckpt.restore(args.step)
        ckpt.close()
        print(f"exporting Orbax checkpoint step {step} from {args.orbax_dir}")
        params = fold_batchnorm(spec, state.params, state.batch_stats)
    else:
        from . import weights as W
        from .models.darknet import fold_batchnorm
        _, pr, bs = W.load_weights(spec, args.weightfile)
        params = fold_batchnorm(spec, pr, bs)

    exported = export_serving(
        spec, params, width=args.width, height=args.height, batch=args.batch,
        pick=_parse_pick(args.pick, args.conf_thresh, args.cls),
        compute_dtype=jnp.bfloat16 if args.compute == "bfloat16"
        else jnp.float32,
        input_dtype=jnp.float32 if args.float_input else jnp.uint8,
        platforms=args.platforms.split(",") if args.platforms else None)
    save_exported(args.out, exported)
    size_mb = os.path.getsize(args.out) / 1e6
    kind = "int8" if args.quantized else "bf16-folded"
    bstr = "poly" if args.batch is None else str(args.batch)
    print(f"exported {kind} serving fn ({args.width}x{args.height}, "
          f"batch={bstr}, pick={args.pick}, "
          f"platforms={list(exported.platforms)}) -> {args.out} "
          f"({size_mb:.1f} MB)")
    return 0
