"""Device mesh + sharding rules (the reference has none to port).

The reference's only "parallelism" is a vestigial single-device
``nn.DataParallel`` wrapper (reference: ``train_multi.py:387``) and a ``gpus``
config key that merely sets ``CUDA_VISIBLE_DEVICES`` (``train.py:330``).  The
TPU-native design is real SPMD:

  * a 2-D ``Mesh`` with axes ``("data", "model")`` — batch sharded over
    ``data``, conv output channels over ``model``,
  * all communication emitted by XLA GSPMD from sharding annotations
    (gradient all-reduce over ICI falls out of jit-of-a-global-sum; no
    hand-written collectives),
  * losses follow the darknet *sum* convention, so data-parallel gradients
    are exact: grad of a global sum over a batch-sharded tensor is an
    all-reduce, which GSPMD inserts.

BatchNorm under this scheme is cross-replica ("sync BN"): ``jnp.mean`` over a
batch-sharded axis is a global mean.  This is a deliberate, documented
improvement over torch DataParallel's per-device statistics.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.darknet import ConnectedSpec, ConvSpec, DarknetSpec

__all__ = ["make_mesh", "batch_sharding", "param_shardings",
           "batch_stats_shardings", "replicated", "shard_host_batch",
           "folded_param_shardings", "shard_train_state"]


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              dp: Optional[int] = None, mp: int = 1) -> Mesh:
    """Build a ("data", "model") mesh over ``devices`` (default: all).

    ``dp`` defaults to ``len(devices) // mp``.  ``mp=1`` gives pure data
    parallelism — the right default for a ~50 MB model; the ``model`` axis is
    still present (size 1) so all sharding rules are mesh-shape agnostic.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % mp != 0:
            raise ValueError(f"{n} devices not divisible by mp={mp}")
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"dp*mp = {dp}*{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Leading-axis (batch) sharding over the ``data`` mesh axis."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def _conv_w_spec(spec: ConvSpec, mp: int) -> P:
    # HWIO: shard output channels over "model" when evenly divisible.
    if mp > 1 and spec.filters % mp == 0:
        return P(None, None, None, "model")
    return P()


def _chan_spec(spec: ConvSpec, mp: int) -> P:
    if mp > 1 and spec.filters % mp == 0:
        return P("model")
    return P()


def param_shardings(net: DarknetSpec, mesh: Mesh) -> Dict[str, Dict[str, NamedSharding]]:
    """Per-parameter NamedShardings for a Darknet param pytree.

    Tensor-parallel rule: conv kernels shard their output-channel (O of HWIO)
    dim over the ``model`` axis, per-channel bias/scale shard likewise.  The
    convolution's input channels stay replicated, so each conv is a local
    matmul over its filter shard and route/shortcut concats resolve with
    GSPMD-inserted collectives.  With ``mp == 1`` everything is replicated —
    pure DP.
    """
    mp = mesh.shape["model"]
    out: Dict[str, Dict[str, NamedSharding]] = {}
    for lspec in net.layers:
        if isinstance(lspec, ConvSpec):
            d = {"w": NamedSharding(mesh, _conv_w_spec(lspec, mp))}
            cs = NamedSharding(mesh, _chan_spec(lspec, mp))
            if lspec.batch_normalize:
                d["scale"] = cs
                d["bias"] = cs
            else:
                d["b"] = cs
            out[lspec.name] = d
        elif isinstance(lspec, ConnectedSpec):
            out[lspec.name] = {
                "w": NamedSharding(mesh, P()),
                "b": NamedSharding(mesh, P()),
            }
    return out


def folded_param_shardings(net: DarknetSpec, mesh: Mesh) -> Dict[str, Dict[str, NamedSharding]]:
    """Shardings for the BN-folded serving pytree ({"w","b"} per conv):
    same TP rule as :func:`param_shardings` (output channels over "model")."""
    mp = mesh.shape["model"]
    out: Dict[str, Dict[str, NamedSharding]] = {}
    for lspec in net.layers:
        if isinstance(lspec, ConvSpec):
            out[lspec.name] = {
                "w": NamedSharding(mesh, _conv_w_spec(lspec, mp)),
                "b": NamedSharding(mesh, _chan_spec(lspec, mp)),
            }
        elif isinstance(lspec, ConnectedSpec):
            out[lspec.name] = {"w": replicated(mesh), "b": replicated(mesh)}
    return out


def batch_stats_shardings(net: DarknetSpec, mesh: Mesh) -> Dict[str, Dict[str, NamedSharding]]:
    mp = mesh.shape["model"]
    out: Dict[str, Dict[str, NamedSharding]] = {}
    for lspec in net.layers:
        if isinstance(lspec, ConvSpec) and lspec.batch_normalize:
            cs = NamedSharding(mesh, _chan_spec(lspec, mp))
            out[lspec.name] = {"mean": cs, "var": cs}
    return out


def shard_train_state(net: DarknetSpec, mesh: Mesh, state):
    """Place EVERY TrainState leaf on ``mesh``: params and momentum by
    :func:`param_shardings`, batch stats by :func:`batch_stats_shardings`,
    and the scalar ``seen`` counter replicated.

    Sharding every leaf (not just the big ones) is load-bearing: a mixed
    state — e.g. a default-placed ``SingleDeviceSharding`` ``seen`` or
    momentum next to NamedSharding params — comes back from the first jitted
    step fully NamedSharding (GSPMD propagates), so the SECOND call sees new
    input shardings and recompiles the whole train step.  That one-off
    recompile is what BENCH_r03's ``train_step_ms_b8_dp_mesh: 196.5`` timed;
    the steady-state meshed step matches the unmeshed one (~10.6 ms at
    batch 8 on one v5e chip).  ``tests/test_training.py::
    test_sharded_state_does_not_recompile`` pins this.
    """
    ps = param_shardings(net, mesh)
    return state._replace(
        params=jax.tree.map(jax.device_put, state.params, ps),
        batch_stats=jax.tree.map(jax.device_put, state.batch_stats,
                                 batch_stats_shardings(net, mesh)),
        momentum=jax.tree.map(jax.device_put, state.momentum, ps),
        seen=jax.device_put(state.seen, replicated(mesh)))


def shard_host_batch(mesh: Mesh, images, target):
    """Place a host batch onto the mesh, batch-sharded over ``data``.

    Single-process path (one host sees all devices): ``jax.device_put`` with a
    NamedSharding splits the array across devices without a gather.
    """
    imgs = jax.device_put(images, batch_sharding(mesh, np.ndim(images)))
    tgts = jax.device_put(target, batch_sharding(mesh, np.ndim(target)))
    return imgs, tgts
