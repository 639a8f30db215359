"""cfg-compiled Darknet: darknet ``.cfg`` blocks → a jittable NHWC forward fn.

This replaces the reference's ``nn.ModuleList`` block interpreter
(reference: ``darknet.py:60-249``) with a compile-once design: the cfg is
parsed into a static :class:`DarknetSpec` (pure Python, hashable), and
``apply`` traces a single XLA graph.  Route/shortcut connectivity is resolved
at spec-build time, and only the outputs that a later route/shortcut actually
consumes are kept live (the reference caches *every* layer output in a dict,
``darknet.py:85,95``).

Layout: NHWC activations, HWIO weights — the MXU-native choice.  Params and
running BN statistics are plain nested dicts (pytrees) so they shard/serialize
trivially with pjit and the darknet ``.weights`` codec.
"""

from __future__ import annotations

import dataclasses
import weakref
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    NetConfig,
    RegionConfig,
    net_config_from_block,
    parse_cfg,
    region_config_from_block,
)
from . import layers as L

__all__ = ["DarknetSpec", "ConvSpec", "fold_batchnorm"]


# ---------------------------------------------------------------------------
# Layer specs (static metadata, resolved at cfg-compile time)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    name: str          # params key, e.g. "conv_3"
    in_filters: int
    filters: int
    size: int
    stride: int
    pad: int
    batch_normalize: bool
    activation: str    # "leaky" | "relu" | "linear"


@dataclasses.dataclass(frozen=True)
class MaxPoolSpec:
    size: int
    stride: int


@dataclasses.dataclass(frozen=True)
class ReorgSpec:
    stride: int


@dataclasses.dataclass(frozen=True)
class RouteSpec:
    layers: Tuple[int, ...]  # absolute layer indices


@dataclasses.dataclass(frozen=True)
class ShortcutSpec:
    from_layer: int          # absolute layer index
    activation: str


@dataclasses.dataclass(frozen=True)
class AvgPoolSpec:
    pass


@dataclasses.dataclass(frozen=True)
class SoftmaxSpec:
    pass


@dataclasses.dataclass(frozen=True)
class ConnectedSpec:
    name: str
    in_features: int
    out_features: int
    activation: str


@dataclasses.dataclass(frozen=True)
class RegionSpec:
    """Placeholder: the region block carries loss hyperparams, skipped in the
    forward pass (reference: ``darknet.py:119-120``)."""
    region: RegionConfig


LayerSpec = Union[ConvSpec, MaxPoolSpec, ReorgSpec, RouteSpec, ShortcutSpec,
                  AvgPoolSpec, SoftmaxSpec, ConnectedSpec, RegionSpec]


class DarknetSpec:
    """Static network description compiled from a darknet ``.cfg``."""

    def __init__(self, blocks: Sequence[Dict[str, str]]):
        self.blocks: List[Dict[str, str]] = list(blocks)
        assert self.blocks and self.blocks[0]["type"] == "net"
        self.net: NetConfig = net_config_from_block(self.blocks[0])
        self.region: Optional[RegionConfig] = None
        self.layers: List[LayerSpec] = []

        prev_filters = self.net.channels
        out_filters: List[int] = []
        conv_id = 0
        for block in self.blocks[1:]:
            btype = block["type"]
            ind = len(self.layers)
            if btype == "convolutional":
                conv_id += 1
                filters = int(block["filters"])
                size = int(block["size"])
                stride = int(block["stride"])
                pad = (size - 1) // 2 if int(block["pad"]) else 0
                self.layers.append(ConvSpec(
                    name=f"conv_{conv_id}",
                    in_filters=prev_filters,
                    filters=filters,
                    size=size,
                    stride=stride,
                    pad=pad,
                    batch_normalize=bool(int(block["batch_normalize"])),
                    activation=block.get("activation", "linear"),
                ))
                prev_filters = filters
            elif btype == "maxpool":
                self.layers.append(MaxPoolSpec(int(block["size"]), int(block["stride"])))
            elif btype == "avgpool":
                self.layers.append(AvgPoolSpec())
            elif btype == "softmax":
                self.layers.append(SoftmaxSpec())
            elif btype == "cost":
                # Training-cost placeholder; no-op at inference (darknet.py:128-129).
                self.layers.append(RegionSpec(RegionConfig()))
            elif btype == "reorg":
                stride = int(block["stride"])
                self.layers.append(ReorgSpec(stride))
                prev_filters = stride * stride * prev_filters
            elif btype == "route":
                refs = [int(i) for i in block["layers"].split(",")]
                refs = tuple(i if i > 0 else i + ind for i in refs)
                self.layers.append(RouteSpec(refs))
                prev_filters = sum(out_filters[i] for i in refs)
            elif btype == "shortcut":
                frm = int(block["from"])
                frm = frm if frm > 0 else frm + ind
                self.layers.append(ShortcutSpec(frm, block.get("activation", "linear")))
                prev_filters = out_filters[ind - 1]
            elif btype == "connected":
                conv_id += 1
                out_features = int(block["output"])
                self.layers.append(ConnectedSpec(
                    name=f"fc_{conv_id}",
                    in_features=prev_filters,
                    out_features=out_features,
                    activation=block.get("activation", "linear"),
                ))
                prev_filters = out_features
            elif btype == "region":
                region = region_config_from_block(block)
                self.region = region
                self.layers.append(RegionSpec(region))
            else:
                raise ValueError(f"unknown block type {btype!r}")
            out_filters.append(prev_filters)

        self.out_filters = out_filters
        # Liveness: which layer outputs are re-read by a later route/shortcut.
        needed = set()
        for i, spec in enumerate(self.layers):
            if isinstance(spec, RouteSpec):
                needed.update(spec.layers)
            elif isinstance(spec, ShortcutSpec):
                needed.add(spec.from_layer)
                needed.add(i - 1)
        self._live = frozenset(needed)

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_cfg(cls, cfgfile: str) -> "DarknetSpec":
        return cls(parse_cfg(cfgfile))

    # -- convenience ---------------------------------------------------------

    @property
    def num_keypoints(self) -> int:
        return self.net.num_keypoints

    @property
    def num_classes(self) -> int:
        return self.region.classes if self.region else 0

    @property
    def num_anchors(self) -> int:
        return self.region.num if self.region else 1

    @property
    def anchors(self) -> Tuple[float, ...]:
        return self.region.anchors if self.region else ()

    def conv_specs(self) -> List[ConvSpec]:
        return [l for l in self.layers if isinstance(l, ConvSpec)]

    # -- parameters ----------------------------------------------------------

    def init_params(self, rng: jax.Array, dtype=jnp.float32):
        """Torch-default init (kaiming_uniform(a=√5) ⇒ U(±1/√fan_in)) so
        randomly-initialized nets are statistically comparable to the
        reference's ``nn.Conv2d`` defaults."""
        params: Dict[str, Dict[str, jax.Array]] = {}
        batch_stats: Dict[str, Dict[str, jax.Array]] = {}
        for spec in self.layers:
            if isinstance(spec, ConvSpec):
                rng, kw, kb = jax.random.split(rng, 3)
                fan_in = spec.in_filters * spec.size * spec.size
                bound = 1.0 / float(np.sqrt(fan_in))
                p: Dict[str, jax.Array] = {
                    "w": jax.random.uniform(
                        kw, (spec.size, spec.size, spec.in_filters, spec.filters),
                        dtype, -bound, bound),
                }
                if spec.batch_normalize:
                    p["scale"] = jnp.ones((spec.filters,), dtype)
                    p["bias"] = jnp.zeros((spec.filters,), dtype)
                    batch_stats[spec.name] = {
                        "mean": jnp.zeros((spec.filters,), dtype),
                        "var": jnp.ones((spec.filters,), dtype),
                    }
                else:
                    p["b"] = jax.random.uniform(kb, (spec.filters,), dtype, -bound, bound)
                params[spec.name] = p
            elif isinstance(spec, ConnectedSpec):
                rng, kw, kb = jax.random.split(rng, 3)
                bound = 1.0 / float(np.sqrt(spec.in_features))
                params[spec.name] = {
                    "w": jax.random.uniform(
                        kw, (spec.in_features, spec.out_features), dtype, -bound, bound),
                    "b": jax.random.uniform(kb, (spec.out_features,), dtype, -bound, bound),
                }
        return params, batch_stats

    # -- forward -------------------------------------------------------------

    @staticmethod
    def _activate(x: jax.Array, activation: str) -> jax.Array:
        if activation == "leaky":
            return L.leaky_relu(x)
        if activation == "relu":
            return jnp.maximum(x, 0)
        return x

    def _walk_other(self, spec: "LayerSpec", i: int, x, cache, params):
        """One non-conv, non-maxpool layer (shared by :meth:`_walk` and the
        quantized interpreter in ``models/quantize.py``)."""
        if isinstance(spec, ReorgSpec):
            return L.reorg(x, spec.stride)
        if isinstance(spec, RouteSpec):
            srcs = [cache[j] for j in spec.layers]
            return srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
        if isinstance(spec, ShortcutSpec):
            return self._activate(cache[spec.from_layer] + cache[i - 1],
                                  spec.activation)
        if isinstance(spec, AvgPoolSpec):
            return L.global_avg_pool(x)
        if isinstance(spec, SoftmaxSpec):
            return jax.nn.softmax(x, axis=-1)
        if isinstance(spec, ConnectedSpec):
            p = params[spec.name]
            return self._activate(x.reshape(x.shape[0], -1) @ p["w"] + p["b"],
                                  spec.activation)
        if isinstance(spec, RegionSpec):
            return x  # loss-carrier block: no-op at forward
        raise ValueError(f"unhandled layer spec {spec!r}")

    def _walk(self, x: jax.Array, conv_fn, params, start: int = 0) -> jax.Array:
        """Shared block interpreter: ``conv_fn(spec, x)`` supplies the
        conv+norm+bias body; every other layer type has one implementation
        here (route liveness keeps only outputs a later layer re-reads).
        ``start`` skips already-computed leading layers (fused stem path —
        only legal when no skipped layer output is re-read later)."""
        cache: Dict[int, jax.Array] = {}
        for i, spec in enumerate(self.layers):
            if i < start:
                continue
            if isinstance(spec, ConvSpec):
                x = self._activate(conv_fn(spec, x), spec.activation)
            elif isinstance(spec, MaxPoolSpec):
                x = L.max_pool(x, spec.size, spec.stride) if spec.stride > 1 \
                    else L.max_pool_stride1(x)
            else:
                x = self._walk_other(spec, i, x, cache, params)
            if i in self._live:
                cache[i] = x
        return x

    @staticmethod
    def _conv(spec: ConvSpec, x: jax.Array, w: jax.Array, cd) -> jax.Array:
        """Convolution with the compute-dtype policy: bf16 in/out when ``cd``
        is set (XLA fuses the f32 epilogue), full f32 otherwise."""
        if cd is not None:
            w = w.astype(cd)
            x = x.astype(cd)
        return L.conv2d(x, w, spec.stride, spec.pad,
                        preferred_dtype=None if cd is not None else jnp.float32)

    def apply(self, params, x: jax.Array, *, batch_stats=None, train: bool = False,
              compute_dtype=None, fused_stem: bool = False, stem_mesh=None):
        """Run the network. ``x`` is NHWC float (0..1 RGB).

        Inference (``train=False``): uses running BN stats; returns the raw
        head tensor (B, H/32, W/32, nA*(2K+1+C)) — region/cost blocks are
        skipped exactly like the reference forward (``darknet.py:119-129``).

        Training (``train=True``): batch-stat BN; returns (out, new_batch_stats).

        ``compute_dtype=jnp.bfloat16`` casts conv inputs/weights to bf16 with
        f32 accumulation — the TPU fast path.

        ``fused_stem=True`` (train only) runs the leading conv+BN+leaky+pool
        block as the Pallas phase-split stem (``ops/stem.py``) when the spec
        matches — silently falls back otherwise.  Under a sharded mesh pass
        ``stem_mesh``: the stem then runs as a ``shard_map`` over the data
        axis with psum'd BN statistics (Mosaic custom calls have no GSPMD
        rule, so the bare kernel would force a full-batch gather); the
        batch gate applies per-device.  Caveat: the fused stem's
        custom VJP returns a structural ZERO for the input-image cotangent
        (training never differentiates w.r.t. the image); for input-gradient
        uses (saliency, adversarial perturbations) keep ``fused_stem=False``.
        """
        if train and batch_stats is None:
            raise ValueError("train=True requires batch_stats")
        new_stats: Dict[str, Dict[str, jax.Array]] = {}
        start = 0
        if fused_stem and train:
            from ..ops.stem import (stem_supported, stem_conv_bn_pool_train,
                                    stem_conv_bn_pool_train_sharded)
            # shape gate inside stem_supported: the stem wins only while
            # C=32 pads the 128-lane axis (batch < 64; measured 1133 sps
            # unfused vs 1058 fused at B=128, 14.9 -> 10.9 ms at B=8);
            # under a mesh the gate sees the per-device batch
            shards = stem_mesh.shape["data"] if stem_mesh is not None else 1
            if stem_supported(self, compute_dtype, x.shape,
                              data_shards=shards):
                spec0 = self.layers[0]
                p0 = params[spec0.name]
                st0 = batch_stats[spec0.name]
                n = x.shape[0] * x.shape[1] * x.shape[2]
                if stem_mesh is not None:
                    x, bm, bv = stem_conv_bn_pool_train_sharded(
                        x, p0["w"], p0["scale"], p0["bias"], stem_mesh)
                else:
                    x, bm, bv = stem_conv_bn_pool_train(
                        x, p0["w"], p0["scale"], p0["bias"])
                nm, nv = L.running_stat_update(st0["mean"], st0["var"],
                                               bm, bv, n)
                new_stats[spec0.name] = {"mean": nm, "var": nv}
                start = 2

        def conv_fn(spec: ConvSpec, x):
            p = params[spec.name]
            x = self._conv(spec, x, p["w"], compute_dtype)
            if spec.batch_normalize:
                if train:
                    st = batch_stats[spec.name]
                    x, nm, nv = L.batch_norm_train(
                        x, p["scale"], p["bias"], st["mean"], st["var"])
                    new_stats[spec.name] = {"mean": nm, "var": nv}
                else:
                    if batch_stats is None:
                        raise ValueError(
                            "inference requires batch_stats (running BN)")
                    st = batch_stats[spec.name]
                    x = L.batch_norm(x, p["scale"], p["bias"], st["mean"],
                                     st["var"])
            else:
                x = x + p["b"]
            return x

        out = self._walk(x, conv_fn, params, start=start)
        if train:
            # carry forward unchanged stats for completeness
            for k, v in batch_stats.items():
                new_stats.setdefault(k, v)
            return out, new_stats
        return out

    def apply_folded(self, folded_params, x: jax.Array, *, compute_dtype=None,
                     fused_stem: bool = False):
        """Inference with BN pre-folded into conv weight/bias (see
        :func:`fold_batchnorm`) — the fastest serving path: one conv + bias +
        leaky per block, fully fusible by XLA.

        The f32 bias is added in f32 but the result is stored back in the
        compute dtype: without the cast the promotion made every post-conv
        serving tensor f32, doubling HBM traffic on the pool/route path (the
        next conv re-rounded to bf16 anyway — same reasoning as
        ``layers.batch_norm``'s dtype rule).

        ``fused_stem=True`` opts the first conv+leaky+pool block into the
        single-kernel Pallas serving stem (``ops/stem.py:stem_conv_pool_infer``)
        when the spec matches.  Off by default — measured honestly: serving is
        forward-only, so the stem removes far fewer passes than in training
        and its fixed per-kernel overheads dominate at small batch (batch-1
        latency 1.19 → 2.39 ms, a 2x LOSS; batch-32 +2.7%, within noise).
        The training stem's win does not transfer."""
        start = 0
        if fused_stem:
            from ..ops.stem import stem_conv_pool_infer, stem_supported
            if stem_supported(self, compute_dtype, x.shape):
                p0 = folded_params[self.layers[0].name]
                x = stem_conv_pool_infer(x, p0["w"], p0["b"])
                start = 2

        def conv_fn(spec: ConvSpec, x):
            p = folded_params[spec.name]
            y = self._conv(spec, x, p["w"], compute_dtype) + p["b"]
            # backbone (ex-BN) convs store bf16; the head conv (no BN) keeps
            # the f32 bias-add — its regression output feeds the decoder and
            # no later conv would have re-rounded it (same precision logic as
            # quantize.py keeping the head un-quantized)
            if compute_dtype is not None and spec.batch_normalize:
                y = y.astype(compute_dtype)
            return y

        return self._walk(x, conv_fn, folded_params, start=start)

    def format_network(self) -> str:
        from ..config import format_cfg_table
        return format_cfg_table(self.blocks)


def _fold_batchnorm_impl(spec: DarknetSpec, params, batch_stats,
                         eps: float = L.BN_EPS):
    folded = {}
    for lspec in spec.layers:
        if isinstance(lspec, ConvSpec):
            p = params[lspec.name]
            if lspec.batch_normalize:
                st = batch_stats[lspec.name]
                inv = p["scale"] / jnp.sqrt(st["var"] + eps)
                folded[lspec.name] = {
                    "w": p["w"] * inv[None, None, None, :],
                    "b": p["bias"] - st["mean"] * inv,
                }
            else:
                folded[lspec.name] = {"w": p["w"], "b": p["b"]}
        elif isinstance(lspec, ConnectedSpec):
            folded[lspec.name] = dict(params[lspec.name])
    return folded


_FOLD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def fold_batchnorm(spec: DarknetSpec, params, batch_stats, eps: float = L.BN_EPS):
    """Fold running BN statistics into conv weights/biases for serving.

    conv-bn(x) = gamma * (W*x - mean)/sqrt(var+eps) + beta
               = (W * gamma/sqrt(var+eps)) * x + (beta - gamma*mean/sqrt(var+eps))

    The fold runs as ONE jitted executable per spec.  Eagerly it is ~4 tiny
    ops per conv (~90 dispatches for darknet-19), and the in-training eval
    cadence re-folds fresh params every eval epoch — through a high-latency
    host↔device link those dispatches alone measured 178 ms of a 515 ms
    eval pass (profiled round 4; the compute itself is sub-ms).
    """
    jitted = _FOLD_CACHE.get(spec)
    if jitted is None:
        spec_ref = weakref.proxy(spec)     # don't pin the WeakKey entry

        def fold(params, batch_stats, eps):
            return _fold_batchnorm_impl(spec_ref, params, batch_stats, eps)

        jitted = jax.jit(fold, static_argnums=2)
        _FOLD_CACHE[spec] = jitted
    return jitted(params, batch_stats, eps)
