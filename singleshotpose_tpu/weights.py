"""Darknet binary ``.weights`` ⇄ params-pytree codec (bit-exact).

Format (reference: ``cfg.py:153-201``, ``darknet.py:251-394``):

* header: 4 × int32, ``header[3]`` = ``seen`` sample counter
* then a flat float32 buffer, consumed per-layer in block order:
    - conv+bn : [bn.bias(beta), bn.weight(gamma), running_mean, running_var,
                 conv.weight(OIHW row-major)]
    - conv    : [conv.bias, conv.weight(OIHW)]
    - fc      : [bias, weight(out×in row-major)]

The TPU model stores conv weights HWIO; this codec transposes OIHW⇄HWIO so a
round-trip through this module is bit-identical (pure reshape/transpose, no
arithmetic).  ``load_until_last`` mirrors ``Darknet.load_weights_until_last``
(``darknet.py:299-347``): it walks ``blocks[:-2]``, i.e. skips the final conv
+ region head so an ImageNet backbone (darknet19_448.conv.23) can initialize a
differently-shaped pose head.

A deliberate divergence from the reference: ``save`` works for connected
layers too (the reference's ``save_weights`` hits an undefined-variable bug on
them, ``darknet.py:373-375`` — never triggered because pose nets have no fc).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .models.darknet import ConnectedSpec, ConvSpec, DarknetSpec

__all__ = [
    "load_weights",
    "load_weights_until_last",
    "save_weights",
    "WeightsHeader",
]


class WeightsHeader:
    """The 4-int32 darknet header; ``seen`` is header[3] (``darknet.py:253-255``)."""

    def __init__(self, values: Optional[np.ndarray] = None):
        self.values = np.zeros(4, dtype=np.int32) if values is None else \
            np.asarray(values, dtype=np.int32).copy()
        assert self.values.shape == (4,)

    @property
    def seen(self) -> int:
        return int(self.values[3])

    @seen.setter
    def seen(self, v: int) -> None:
        self.values[3] = v


def _conv_from_buf(buf: np.ndarray, start: int, spec: ConvSpec) -> Tuple[Dict, Dict, int]:
    n = spec.filters
    num_w = spec.filters * spec.in_filters * spec.size * spec.size
    p: Dict[str, np.ndarray] = {}
    st: Dict[str, np.ndarray] = {}
    if spec.batch_normalize:
        p["bias"] = buf[start:start + n].copy(); start += n
        p["scale"] = buf[start:start + n].copy(); start += n
        st["mean"] = buf[start:start + n].copy(); start += n
        st["var"] = buf[start:start + n].copy(); start += n
    else:
        p["b"] = buf[start:start + n].copy(); start += n
    w = buf[start:start + num_w]; start += num_w
    # darknet stores OIHW row-major; model uses HWIO
    w = w.reshape(spec.filters, spec.in_filters, spec.size, spec.size)
    p["w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    return p, st, start


def _fc_from_buf(buf: np.ndarray, start: int, spec: ConnectedSpec) -> Tuple[Dict, int]:
    nb, nw = spec.out_features, spec.in_features * spec.out_features
    b = buf[start:start + nb].copy(); start += nb
    w = buf[start:start + nw].reshape(spec.out_features, spec.in_features)
    start += nw
    return {"w": np.ascontiguousarray(w.T), "b": b}, start


def _load(spec: DarknetSpec, path: str, skip_last_blocks: int):
    with open(path, "rb") as fp:
        header = WeightsHeader(np.fromfile(fp, count=4, dtype=np.int32))
        buf = np.fromfile(fp, dtype=np.float32)

    params: Dict[str, Dict[str, np.ndarray]] = {}
    batch_stats: Dict[str, Dict[str, np.ndarray]] = {}
    start = 0
    # spec.layers excludes the [net] block; blocks[:-k] in the reference maps
    # to layers[:-(k)] here (the reference iterates blocks[0..len-3] which
    # includes [net] as a no-op: darknet.py:309-316).
    layers = spec.layers if skip_last_blocks == 0 else spec.layers[:-skip_last_blocks]
    for lspec in layers:
        if start >= buf.size:
            break
        if isinstance(lspec, ConvSpec):
            p, st, start = _conv_from_buf(buf, start, lspec)
            params[lspec.name] = p
            if st:
                batch_stats[lspec.name] = st
        elif isinstance(lspec, ConnectedSpec):
            params[lspec.name], start = _fc_from_buf(buf, start, lspec)
    return header, params, batch_stats, start, buf.size


def load_weights(spec: DarknetSpec, path: str):
    """Load a full reference ``.weights`` file → (header, params, batch_stats).

    Bit-exact: arrays are float32 views of the original buffer contents.
    """
    header, params, batch_stats, used, total = _load(spec, path, 0)
    return header, params, batch_stats


def load_weights_until_last(spec: DarknetSpec, path: str, rng=None):
    """Backbone-only load (skips final conv + region block), then fresh-inits
    any layers the file didn't cover (reference usage: ``train.py:338``).

    Returns (header, params, batch_stats) with *all* layers present.
    """
    import jax

    header, params, batch_stats, _, _ = _load(spec, path, 2)
    full_p, full_st = spec.init_params(
        jax.random.PRNGKey(0) if rng is None else rng)
    full_p = jax.tree_util.tree_map(np.asarray, full_p)
    full_st = jax.tree_util.tree_map(np.asarray, full_st)
    for k, v in params.items():
        full_p[k] = v
    for k, v in batch_stats.items():
        full_st[k] = v
    return header, full_p, full_st


def save_weights(spec: DarknetSpec, params, batch_stats, path: str,
                 seen: int = 0, header: Optional[WeightsHeader] = None,
                 cutoff: int = 0) -> None:
    """Write darknet binary format (reference: ``darknet.py:350-394``).

    ``cutoff`` counts *blocks after [net]* like the reference's
    ``save_weights(cutoff)``; 0 ⇒ all layers.
    """
    hdr = WeightsHeader() if header is None else header
    hdr.seen = seen
    layers = spec.layers if cutoff <= 0 else spec.layers[:cutoff]
    with open(path, "wb") as fp:
        hdr.values.tofile(fp)
        for lspec in layers:
            if isinstance(lspec, ConvSpec):
                p = {k: np.asarray(v, dtype=np.float32) for k, v in params[lspec.name].items()}
                if lspec.batch_normalize:
                    st = {k: np.asarray(v, dtype=np.float32)
                          for k, v in batch_stats[lspec.name].items()}
                    p["bias"].tofile(fp)
                    p["scale"].tofile(fp)
                    st["mean"].tofile(fp)
                    st["var"].tofile(fp)
                else:
                    p["b"].tofile(fp)
                # HWIO → OIHW row-major
                np.ascontiguousarray(p["w"].transpose(3, 2, 0, 1)).tofile(fp)
            elif isinstance(lspec, ConnectedSpec):
                p = {k: np.asarray(v, dtype=np.float32) for k, v in params[lspec.name].items()}
                p["b"].tofile(fp)
                np.ascontiguousarray(p["w"].T).tofile(fp)


def resume_counters(header: WeightsHeader, batch_size: int, nsamples: int) -> Tuple[int, int]:
    """Derive (processed_batches, init_epoch) from the ``seen`` counter, as the
    reference does on resume (``train.py:343-346``)."""
    seen = header.seen
    if nsamples <= 0:
        return 0, 0
    return seen // batch_size, seen // nsamples
