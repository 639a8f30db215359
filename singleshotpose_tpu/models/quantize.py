"""int8 post-training quantization for the folded serving path.

A serving-only capability the reference has no analogue for (its inference is
f32 torch, ``valid.py:83-87``): TPU v5e's MXU int8 nameplate is 2× the bf16
peak (394 vs 197 TOP/s), so a quantized Darknet forward raises the
inference-fps ceiling past the bf16 speed-of-light.  Realized end-to-end:
1.45× at batch 128 — the deep MXU-bound stages get the full ~2×, the
layout-bound early stages get ~nothing, and the mix is this chip's measured
floor (docs/design.md §7b attribution table).

Scheme (standard symmetric PTQ, chosen for XLA-fusibility):

- **Weights**: per-output-channel symmetric int8. ``sw[c] = absmax(w[...,c])/127``,
  ``wq = round(w / sw)``. Per-channel scales cost nothing at serving time —
  they fold into the one dequant multiply that XLA fuses into the conv
  epilogue.
- **Activations**: per-layer static symmetric scales from a calibration pass
  (absmax of each conv *input* over N representative batches, recorded by
  running the folded net with a recording ``conv_fn``). Static scales keep
  the serving graph free of data-dependent reductions.
- **Dataflow per block**: ``x → round(x/sa) → int8 conv (int32 accum on the
  MXU) → ×(sa·sw) dequant → +b → leaky``. The quant/dequant elementwise
  chains fuse into the conv's prologue/epilogue; the MXU does all the work.
- **Skipped layers** stay in the compute dtype (default bf16): the head conv
  (a *regression* output — keypoint offsets need more than 8 bits of output
  scale) and any conv whose input absmax calibrated to 0. The first conv
  (3 input channels) is quantized but is MXU-starved either way.

Accuracy: quantization error is validated in ``tests/test_quantize.py``
(head-tensor agreement + decode box agreement vs the bf16 folded path) and
end-to-end by ``examples/overfit_validation.py --quantize`` (pose metrics on
a trained net).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, Optional, Sequence

import jax
import jax.numpy as jnp

from .darknet import ConnectedSpec, ConvSpec, DarknetSpec

__all__ = ["calibrate_activations", "quantize_folded", "apply_quantized",
           "default_skip_layers", "save_quantized", "load_quantized"]

_INT8_MAX = 127.0


def default_skip_layers(spec: DarknetSpec) -> FrozenSet[str]:
    """Layers kept un-quantized by default: the final (head) conv.

    The head emits raw keypoint offsets consumed by the decoder at f32
    precision (``ops/decode.py``); an 8-bit output grid costs ~0.5 px of
    keypoint resolution at 416², which is visible in the 5-px reprojection
    metric. Every backbone conv feeds a leaky+BN-folded chain where int8 is
    lossless in practice.
    """
    convs = spec.conv_specs()
    return frozenset({convs[-1].name}) if convs else frozenset()


def calibrate_activations(spec: DarknetSpec, folded_params, images,
                          *, compute_dtype=jnp.bfloat16,
                          percentile: Optional[float] = None,
                          per_channel: bool = False
                          ) -> Dict[str, float]:
    """One folded forward over ``images`` recording each conv input's range.

    Returns {conv_name: range_statistic} as host floats. ``images`` is a
    single representative NHWC batch (concatenate several along batch for a
    larger calibration set — static shapes keep this one executable).

    ``percentile=None`` records the absmax (exact coverage: no calibration
    input ever clips).  ``percentile=99.9`` (etc.) records that percentile
    of |x| instead — the standard PTQ remedy for heavy-tailed activations.
    **Measured to be harmful on this architecture/task** (3 seeds × 256
    held-out frames, same protocol as ``bench.py bench_int8_acc``):
    absmax acc@5px deltas were +1.6/−7.0/−0.4 pp vs bf16, while p99.9
    collapsed accuracy to 0-9% (mean error 11-23 px) and p99.99 still lost
    4-48 pp — a detection head's salient activations (the responding cell's
    features) ARE the distribution tail, so tail-clipping clips the signal
    itself.  Absmax stays the default; the knob remains for nets where the
    tail really is noise.

    ``per_channel=True`` records a per-input-channel absmax VECTOR instead:
    :func:`quantize_folded` then folds the channel scales into the weights
    (activation-range equalization), giving every input channel its full
    8-bit range at zero extra serving cost — the input quant becomes a
    broadcast per-channel divide and the dequant stays one per-output
    multiply.  BN-folded conv inputs have strongly per-channel ranges, so
    this is the first knob to try when absmax costs accuracy.
    """
    records: Dict[str, jax.Array] = {}

    @jax.jit
    def run(p, x):
        def conv_fn(cspec: ConvSpec, x):
            ax = jnp.abs(x).astype(jnp.float32)
            if per_channel:
                # per-input-channel range over batch+space (NHWC)
                records[cspec.name] = jnp.max(ax, axis=(0, 1, 2))
            elif percentile is None:
                records[cspec.name] = jnp.max(ax)
            else:
                records[cspec.name] = jnp.percentile(ax.reshape(-1),
                                                     percentile)
            return DarknetSpec._conv(cspec, x, p[cspec.name]["w"],
                                     compute_dtype) + p[cspec.name]["b"]

        out = spec._walk(x, conv_fn, p)
        return out, dict(records)

    _, recs = run(folded_params, images)
    recs = jax.device_get(recs)
    if per_channel:
        import numpy as np
        return {k: np.asarray(v, np.float32) for k, v in recs.items()}
    return {k: float(v) for k, v in recs.items()}


def quantize_folded(spec: DarknetSpec, folded_params,
                    act_absmax: Dict[str, float],
                    *, skip_layers: Optional[Sequence[str]] = None):
    """folded f32 params + calibration absmaxes → int8 serving params.

    Returns a pytree: quantized convs carry ``{"wq": int8 HWIO, "sw": f32[C]
    (weight scale), "sa" (input activation scale): f32 scalar, or f32[Cin]
    when calibrated ``per_channel`` (equalized — already folded into ``wq``,
    kept for the input quantizer), "b": f32[C]}``; skipped convs and
    connected layers keep their folded ``{"w","b"}``.
    """
    skip = frozenset(skip_layers) if skip_layers is not None \
        else default_skip_layers(spec)
    out = {}
    for lspec in spec.layers:
        if isinstance(lspec, ConvSpec):
            p = folded_params[lspec.name]
            amax = act_absmax.get(lspec.name, 0.0)
            per_ch = getattr(amax, "ndim", 0) == 1
            if lspec.name in skip or \
                    (float(jnp.max(amax)) if per_ch else amax) <= 0.0:
                out[lspec.name] = {"w": p["w"], "b": p["b"]}
                continue
            w = p["w"].astype(jnp.float32)
            if per_ch:
                # activation-range equalization: quantize x per input
                # channel with sa[c], fold sa into the weights so the
                # dequant stays ONE per-output multiply:
                #   y_o = Σ_c (x_c/sa_c)·(w_{c,o}·sa_c) — exact identity.
                # Dead channels get a floored scale so off-calibration
                # inputs cannot blow up the int8 grid.
                amax = jnp.maximum(jnp.asarray(amax, jnp.float32),
                                   1e-3 * jnp.max(amax))
                sa = amax / _INT8_MAX                       # (Cin,)
                w = w * sa[None, None, :, None]             # HWIO
            else:
                sa = jnp.float32(amax / _INT8_MAX)
            sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)),
                             1e-12) / _INT8_MAX
            wq = jnp.clip(jnp.round(w / sw), -_INT8_MAX, _INT8_MAX)
            out[lspec.name] = {
                "wq": wq.astype(jnp.int8),
                "sw": sw,
                "sa": sa,
                "b": p["b"].astype(jnp.float32),
            }
        elif isinstance(lspec, ConnectedSpec):
            out[lspec.name] = dict(folded_params[lspec.name])
    return out


def save_quantized(path: str, qparams) -> None:
    """Serialize an int8 serving pytree to ``.npz`` (keys ``layer/field``).

    The deployable artifact: calibrate + quantize once (``ssp quantize``),
    then serve from this file without the f32 weights or calibration data.
    """
    import numpy as np
    flat = {f"{layer}/{field}": np.asarray(v)
            for layer, d in qparams.items() for field, v in d.items()}
    np.savez(path, **flat)


def load_quantized(path: str):
    """Load a pytree written by :func:`save_quantized` (host numpy leaves —
    `jax.device_put` or a sharding placement happens at first use)."""
    import numpy as np
    out: Dict[str, Dict[str, object]] = {}
    with np.load(path) as z:
        for key in z.files:
            layer, field = key.rsplit("/", 1)
            out.setdefault(layer, {})[field] = z[key]
    return out


def _quant_act(x: jax.Array, sa) -> jax.Array:
    return jnp.clip(jnp.round(x.astype(jnp.float32) / sa),
                    -_INT8_MAX, _INT8_MAX).astype(jnp.int8)


def apply_quantized(spec: DarknetSpec, qparams, x: jax.Array,
                    *, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Serving forward with int8 convs (int32 MXU accumulation).

    Same contract as :meth:`DarknetSpec.apply_folded`: NHWC float 0..1 in,
    raw head tensor out. Layers without a ``wq`` entry run in
    ``compute_dtype`` exactly like the folded path.

    Uses its own interpreter instead of :meth:`DarknetSpec._walk` for one
    HBM optimization: **max-pool commutes with the monotone int8 quantizer**
    (``max(clip(round(v/sa))) == clip(round(max(v)/sa))`` — round/clip are
    non-decreasing), so when a pool chain feeds a quantized conv the input is
    quantized *before* the pools. The pools then run on int8 (half bf16's
    HBM traffic on the largest activations in the net) and the requant fuses
    into the producer conv's epilogue, so the intermediate materializes as
    int8. Bit-exact vs quantizing at the conv input (pinned by
    ``tests/test_quantize.py``).
    """
    from . import layers as L
    from .darknet import MaxPoolSpec

    layers = spec.layers

    def pool_consumer_scale(i: int):
        """If layers[i:] is a run of non-live maxpools ending at a quantized
        conv, return (conv_name, sa); else None. Liveness bail: a pooled
        int8 tensor must not be what a later route/shortcut re-reads."""
        j = i
        while j < len(layers) and isinstance(layers[j], MaxPoolSpec):
            if j in spec._live:
                return None
            j += 1
        if j < len(layers) and isinstance(layers[j], ConvSpec):
            p = qparams[layers[j].name]
            if "wq" in p:
                return layers[j].name, p["sa"]
        return None

    def quant_conv(cspec: ConvSpec, xq, sa):
        p = qparams[cspec.name]
        y = L.conv2d(xq, p["wq"], cspec.stride, cspec.pad,
                     preferred_dtype=jnp.int32)
        # per-channel sa (rank 1) is already folded into the weights at
        # quantize_folded time — dequant is the per-output sw alone
        scale = p["sw"] if getattr(sa, "ndim", 0) == 1 else sa * p["sw"]
        y = y.astype(jnp.float32) * jnp.asarray(scale, jnp.float32) + p["b"]
        return y.astype(compute_dtype) if compute_dtype is not None else y

    cache = {}
    xq = None           # int8 rep of x, quantized with `xq_for`'s input scale
    xq_for = None
    for i, lspec in enumerate(layers):
        if isinstance(lspec, ConvSpec):
            p = qparams[lspec.name]
            if "wq" in p:
                if xq is not None and xq_for == lspec.name:
                    x = quant_conv(lspec, xq, p["sa"])
                else:
                    x = quant_conv(lspec, _quant_act(x, p["sa"]), p["sa"])
            else:
                x = DarknetSpec._conv(lspec, x, p["w"], compute_dtype) + p["b"]
            x = spec._activate(x, lspec.activation)
            xq = None
        elif isinstance(lspec, MaxPoolSpec):
            if xq is None:
                hit = pool_consumer_scale(i)
                if hit is not None:
                    xq_for, sa = hit
                    xq = _quant_act(x, sa)
            pool = (lambda a: L.max_pool(a, lspec.size, lspec.stride)) \
                if lspec.stride > 1 else L.max_pool_stride1
            if xq is not None:
                xq = pool(xq)
                x = None    # consumed by the next (quantized) conv as xq
            else:
                x = pool(x)
        else:
            # every non-conv/pool layer runs exactly like DarknetSpec._walk
            x = spec._walk_other(lspec, i, x, cache, qparams)
            xq = None
        if i in spec._live:
            cache[i] = x
    return x
