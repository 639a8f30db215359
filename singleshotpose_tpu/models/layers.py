"""Primitive layer ops for the cfg-compiled Darknet, NHWC / TPU-first.

These are the JAX equivalents of the reference's custom torch modules
(reference: ``darknet.py:8-56`` — ``MaxPoolStride1``, ``Reorg``,
``GlobalAvgPool2d``), re-derived for NHWC layout so convolutions map directly
onto the MXU and XLA can fuse the elementwise tails (BN/leaky) into the conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "conv2d",
    "batch_norm",
    "running_stat_update",
    "leaky_relu",
    "max_pool",
    "max_pool_stride1",
    "reorg",
    "global_avg_pool",
]

BN_EPS = 1e-4  # reference: darknet.py:157 (nn.BatchNorm2d(filters, eps=1e-4))


def conv2d(x: jax.Array, w: jax.Array, stride: int, pad: int,
           *, preferred_dtype=jnp.float32) -> jax.Array:
    """2-D convolution, NHWC activations × HWIO weights (MXU-friendly).

    ``pad`` is symmetric spatial padding, matching torch ``nn.Conv2d(padding=pad)``.
    """
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_dtype,
    )


def batch_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               mean: jax.Array, var: jax.Array, eps: float = BN_EPS) -> jax.Array:
    """Normalize with given statistics (inference form).

    Math runs in f32; the result is cast back to ``x.dtype``.  With bf16
    activations this keeps every post-conv tensor (BN/leaky/pool and their
    backward residuals) at half the HBM traffic — previously the f32
    promotion here made the entire train-mode activation path f32 even
    under ``compute_dtype=bfloat16`` (the next conv re-rounded to bf16
    anyway, so the extra precision was never observed by the network's
    linear path).
    """
    inv = scale * lax.rsqrt(var + eps)
    y = x.astype(jnp.float32) * inv + (bias - mean * inv)
    return y.astype(x.dtype)


def batch_norm_train(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     running_mean: jax.Array, running_var: jax.Array,
                     *, eps: float = BN_EPS, momentum: float = 0.1):
    """Training-mode batch norm over (N,H,W) with torch-compatible running-stat
    update: normalize with the *biased* batch variance, update running_var with
    the *unbiased* one, ``running = (1-m)*running + m*batch`` (torch default
    momentum 0.1, as used by the reference's ``nn.BatchNorm2d``).

    Under pjit with the batch axis sharded, the mean/var reductions become
    global (XLA inserts the cross-chip psum), i.e. sync-BN across the data-
    parallel mesh — a deliberate improvement over per-device BN.

    Returns (y, new_running_mean, new_running_var).
    """
    x32 = x.astype(jnp.float32)
    batch_mean = jnp.mean(x32, axis=(0, 1, 2))
    batch_var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(batch_mean)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    y = batch_norm(x, scale, bias, batch_mean, batch_var, eps)
    new_mean, new_var = running_stat_update(
        running_mean, running_var, batch_mean, batch_var, n,
        momentum=momentum)
    return y, new_mean, new_var


def running_stat_update(running_mean, running_var, batch_mean, batch_var,
                        n: int, *, momentum: float = 0.1):
    """torch-convention running-stat update (one source of truth, shared by
    :func:`batch_norm_train` and the fused Pallas stem): ``running =
    (1-m)*running + m*batch`` with the *unbiased* batch variance."""
    unbiased = batch_var * (n / max(n - 1, 1))
    return ((1 - momentum) * running_mean + momentum * batch_mean,
            (1 - momentum) * running_var + momentum * unbiased)


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def max_pool(x: jax.Array, size: int, stride: int) -> jax.Array:
    """Max pool, VALID padding (torch ``nn.MaxPool2d(size, stride)`` default).

    Backward goes through XLA's ``SelectAndScatter``.  A custom reverse-mode
    rule (windows reshape + first-max mask, also a reorg/space-to-depth
    variant) was measured end-to-end in the batch-8 train step and LOST to
    SelectAndScatter once activations stayed bf16 (15.1 ms vs 15.9 ms per
    step) — the transpose relayouts cost more than the window scan saves, so
    the plain form is the fast one on this hardware.
    """
    init = -np.inf if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        # init_value must be a CONCRETE scalar carrying the operand dtype
        # exactly: a bare Python int defaults to int32 (rejecting the
        # quantized path's int8 pooling) and a traced jnp scalar breaks
        # reduce_window's reverse-mode rule
        x, np.asarray(init, jax.dtypes.canonicalize_dtype(x.dtype)),
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def max_pool_stride1(x: jax.Array) -> jax.Array:
    """Stride-1 2×2 max pool with replicate pad right/bottom.

    Reference: ``darknet.py:8-14`` (``F.max_pool2d(F.pad(x,(0,1,0,1),'replicate'),2,1)``).
    """
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    return max_pool(x, 2, 1)


def reorg(x: jax.Array, stride: int = 2) -> jax.Array:
    """Space-to-depth with darknet's channel ordering.

    Derived from the reference's view/transpose sequence (``darknet.py:16-34``):
    out[b, i, k, (j*stride + l)*C + c] = x[b, i*stride + j, k*stride + l, c]
    i.e. the intra-block spatial offset is the *major* axis of the new channel
    dim and the original channel the minor one.  A plain
    ``jax.lax.space_to_depth`` style reshape would give (c-major) ordering and
    break bit-parity with reference ``.weights`` consumers.
    """
    b, h, w, c = x.shape
    assert h % stride == 0 and w % stride == 0
    x = x.reshape(b, h // stride, stride, w // stride, stride, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // stride, w // stride, stride * stride * c)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B,C) mean (reference: ``darknet.py:37-48``)."""
    return jnp.mean(x, axis=(1, 2))
