"""Training core: darknet-convention SGD, LR step schedule, pjit train step.

Rebuild of the reference driver's optimization semantics
(reference: ``train.py:34-46`` schedule, ``train.py:381-388`` optimizer,
``train.py:76-129`` hot loop) as a single fused, donated, jitted step —
forward, loss, backward, and SGD update in one XLA program.  No host syncs
in the loop: target assignment is on-device (``ops/targets.py``) and stats
come back as device scalars fetched asynchronously.

Optimizer semantics (torch SGD, dampening=0, no nesterov — what the
reference constructs):

    d = grad + weight_decay * param
    buf = momentum * buf + d
    param = param - lr * buf

with the darknet conventions applied by the driver: effective
``lr = schedule_lr(...) / batch_size`` and ``weight_decay = decay *
batch_size`` (``train.py:45,388``).  The reference builds per-param no-decay
groups for BN/bias and then *discards* them (``train.py:381-388``) — decay is
uniform.  We default to the same uniform decay for parity and expose
``decay_bn_bias=False`` to opt into the obviously-intended behavior.

Data parallelism: the loss is a *sum* over the batch, so with the batch
sharded over the mesh's ``data`` axis the gradient of the jitted global sum
IS the all-reduced data-parallel gradient — GSPMD inserts the psum over ICI.
BatchNorm becomes cross-replica (sync BN); documented divergence from torch
DataParallel per-device stats.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .models.darknet import DarknetSpec
from .ops.losses import RegionLossConfig, region_loss

__all__ = ["TrainState", "init_train_state", "schedule_lr", "sgd_apply",
           "make_train_step", "make_eval_forward"]


class TrainState(NamedTuple):
    """Pure pytree train state (params/stats/momentum share tree structure)."""
    params: Any
    batch_stats: Any
    momentum: Any
    seen: jax.Array   # int32 scalar: samples processed (darknet header[3])


def init_train_state(params, batch_stats) -> TrainState:
    momentum = jax.tree.map(jnp.zeros_like, params)
    return TrainState(params, batch_stats, momentum,
                      jnp.asarray(0, jnp.int32))


def schedule_lr(base_lr: float, processed_batches: float,
                steps: Sequence[float], scales: Sequence[float]) -> float:
    """Darknet step schedule (reference: ``train.py:34-46``).

    ``steps`` are in units of batches (the driver pre-multiplies the cfg's
    epoch-valued steps by nbatches, ``train.py:307``).  Scales apply
    cumulatively once ``processed_batches`` passes each step; iteration stops
    at the first future step.  Returns the *darknet* lr — divide by batch
    size before applying (``train.py:45``).
    """
    lr = base_lr
    for i, step in enumerate(steps):
        scale = scales[i] if i < len(scales) else 1.0
        if processed_batches >= step:
            lr = lr * scale
            if processed_batches == step:
                break
        else:
            break
    return lr


def sgd_apply(params, grads, momentum, lr, wd: float, momentum_coef: float,
              no_decay_mask=None):
    """One torch-semantics SGD step over a pytree. Returns (params, momentum).

    ``no_decay_mask``: optional pytree of bools (True = skip weight decay),
    for the intended-but-dropped BN/bias exemption."""
    def new_m(p, g, m, skip_decay=False):
        return momentum_coef * m + (g if skip_decay else g + wd * p)

    if no_decay_mask is None:
        new_momentum = jax.tree.map(new_m, params, grads, momentum)
    else:
        new_momentum = jax.tree.map(new_m, params, grads, momentum,
                                    no_decay_mask)
    new_params = jax.tree.map(lambda p, m: p - lr * m, params, new_momentum)
    return new_params, new_momentum


def no_decay_mask_for(net: DarknetSpec, params) -> Any:
    """True for BN scale/bias and conv/fc biases (torch name contains '.bn'
    or '.bias', reference ``train.py:383-386``)."""
    def mask_entry(layer: Dict[str, jax.Array]) -> Dict[str, bool]:
        return {k: k in ("scale", "bias", "b") for k in layer}
    return {name: mask_entry(v) for name, v in params.items()}


def make_train_step(net: DarknetSpec, loss_cfg: RegionLossConfig, *,
                    weight_decay: float, momentum: float,
                    compute_dtype=jnp.bfloat16,
                    decay_bn_bias: bool = True,
                    donate: bool = True,
                    jit_compile: bool = True,
                    fused_stem: bool = False,
                    stem_mesh=None):
    """Build the fused jitted train step.

    Returns ``step(state, images, target, lr, epoch) -> (state, stats)``.
    ``images`` NHWC float32 in [0,1]; ``target`` (B, 50*(2K+3)); ``lr`` the
    already-/batch_size effective learning rate (device scalar ok); ``epoch``
    scalar for the pretrain confidence gate.  ``jit_compile=False`` returns
    the raw traceable function (for embedding in an outer jitted program,
    e.g. bench.py's on-device chained steps).  ``stem_mesh``: the training
    mesh, when ``fused_stem`` should run under data-parallel sharding
    (shard_map over the data axis — see ``ops/stem.py``).
    """
    def step(state: TrainState, images, target, lr, epoch):
        if jnp.issubdtype(images.dtype, jnp.integer):
            # u8 transfer path: normalize on device (4x lighter h2d,
            # bit-identical to host-side /255)
            images = images.astype(jnp.float32) / 255.0

        def loss_fn(params):
            out, new_stats = net.apply(params, images,
                                       batch_stats=state.batch_stats,
                                       train=True, compute_dtype=compute_dtype,
                                       fused_stem=fused_stem,
                                       stem_mesh=stem_mesh)
            loss, stats = region_loss(out, target, epoch, loss_cfg)
            return loss, (new_stats, stats)

        grads, (new_bstats, stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        nd = None if decay_bn_bias else no_decay_mask_for(net, state.params)
        new_params, new_mom = sgd_apply(state.params, grads, state.momentum,
                                        lr, weight_decay, momentum,
                                        no_decay_mask=nd)
        new_seen = state.seen + jnp.asarray(images.shape[0], jnp.int32)
        return TrainState(new_params, new_bstats, new_mom, new_seen), stats

    if not jit_compile:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_forward(net: DarknetSpec, *, compute_dtype=jnp.bfloat16,
                      folded: bool = False):
    """Jitted inference forward → raw head tensor (decode separately)."""
    if folded:
        def fwd(params, images):
            return net.apply_folded(params, images, compute_dtype=compute_dtype)
    else:
        def fwd(params, batch_stats, images):
            return net.apply(params, images, batch_stats=batch_stats,
                             train=False, compute_dtype=compute_dtype)
    return jax.jit(fwd)
