"""Fused Pallas stem: conv1 (3x3, CI=3 -> CO=32) + train-mode BatchNorm +
leaky ReLU + 2x2/2 max pool as two kernels, without ever materializing the
conv output in NHWC form.

Why this exists
---------------
The first Darknet block (reference: ``darknet.py:150-169`` builds it from
``cfg/yolo-pose.cfg``'s leading ``[convolutional]`` + ``[maxpool]``) is where
the batch-8 train step spends ~40% of its time on TPU, despite holding ~2% of
the FLOPs.  The cause is layout, not compute: XLA materializes the conv
output ``(B, H, W, 32)`` with channels on the 128-wide lane dimension, so a
C=32 tensor physically occupies 4x its logical bytes, and *every* pass over
it (BN stats, BN apply, leaky, pool forward, pool backward, BN backward,
conv weight-grad) moves ~350 MB at 416 square, batch 8.  Profiling the fused
train step attributed ~5.3 ms of a 14.7 ms step to this one block.

The fix is a private layout.  The image is re-packed once into *phase-split
planes*: for each input channel, pool-parity (sy, sx) and column shift, a
2-D plane of shape (U, WL2) stored flat with rows padded to a lane multiple.
In that layout:

- the convolution becomes per-phase MXU dots ``(CO, 27) @ (27, N)`` over
  im2col rows gathered with *aligned contiguous* lane slices (no strided or
  unaligned vector loads, which Mosaic cannot lower);
- the 2x2/2 max pool becomes an elementwise max over the four phase values
  held in registers — no SelectAndScatter, no window scan;
- the backward pass needs no conv recompute: the saved per-phase conv
  outputs give x-hat and the pool routing, and the weight gradient is again
  per-phase MXU dots contracting over pixels.

Phase order (0,0),(0,1),(1,0),(1,1) is the pool window's row-major (dy, dx)
order, so first-max tie routing matches torch/SelectAndScatter exactly.

Numerics match the unfused path (``models/layers.py``): conv in bf16 with
f32 accumulation, BN math in f32 with bf16 output, leaky on bf16, running
statistics handled by the caller from the returned batch stats.  The only
divergence is f32 summation order in the statistics and gradient reductions.

Measured (TPU v5e, batch 8, 416 square, bf16): see docs/design.md section 2.
"""

from __future__ import annotations

import functools

import numpy as np
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["stem_supported", "stem_conv_bn_pool_train",
           "stem_conv_bn_pool_train_sharded"]

_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))  # pool window row-major (dy, dx)
_TP = 16          # pooled rows per grid step; divides H/2 for all multiscale
_CO = 32          # stem conv output channels (yolo-pose conv_1)
_CI = 3
_EPS = 1e-4       # models.layers.BN_EPS

# Tests set this to run the kernels through the Pallas interpreter on the
# CPU backend (conftest's virtual mesh); on TPU it must stay False.
FORCE_INTERPRET = False


def stem_supported(spec, compute_dtype, shape=None, data_shards: int = 1
                   ) -> bool:
    """True when ``spec``'s first two layers are the fusable stem pattern and
    the compute dtype is bf16 (the layout win assumes bf16 activations).

    ``shape``: optional input (B, H, W, C) — when given, also applies the
    measured batch gate (the stem wins only while C=32 pads the 128-lane
    axis, i.e. batch < 64; at batch 128 the batch dim fills the lanes and
    the unfused path is faster) and the 32-multiple H/W requirement.
    ``data_shards``: size of the mesh's data axis when the stem will run
    under :func:`stem_conv_bn_pool_train_sharded` — the batch gate then
    applies to the PER-DEVICE batch (each device runs the kernel on its
    local shard), and the global batch must divide evenly."""
    from ..models.darknet import ConvSpec, MaxPoolSpec
    if compute_dtype != jnp.bfloat16:
        return False
    if jax.default_backend() != "tpu" and not FORCE_INTERPRET:
        return False
    if shape is not None:
        B, H, W = shape[0], shape[1], shape[2]
        if B % data_shards:
            return False
        if B // data_shards >= 64 or B < data_shards or H % 32 or W % 32:
            return False
    if len(spec.layers) < 2:
        return False
    c, m = spec.layers[0], spec.layers[1]
    if not (isinstance(c, ConvSpec) and isinstance(m, MaxPoolSpec)):
        return False
    if not (c.in_filters == _CI and c.filters == _CO and c.size == 3
            and c.stride == 1 and c.pad == 1 and c.batch_normalize
            and c.activation == "leaky"):
        return False
    if not (m.size == 2 and m.stride == 2):
        return False
    # route/shortcut liveness: nothing may re-read layer 0 or 1 outputs
    if 0 in spec._live or 1 in spec._live:
        return False
    return True


def _dims(H: int, W: int) -> Tuple[int, int, int]:
    # H, W must be multiples of 2*TP so the (B, H/2 // TP) grid tiles the
    # pooled rows exactly — true for every darknet input (multiples of 32)
    assert H % (2 * _TP) == 0 and W % 2 == 0, (H, W)
    hp, wp = H // 2, W // 2
    wl2 = ((wp + 2 + 127) // 128) * 128
    return hp, wp, wl2


def _plane_idx(ci: int, sy: int, sx: int, sh: int) -> int:
    return ci * 8 + sy * 4 + sx * 2 + sh


def _prep_planes(images: jax.Array) -> jax.Array:
    """(B, H, W, 3) float -> (B, 24, U*WL2) bf16 phase-split shifted planes.

    plane[ci, sy, sx, sh][u, v] = img_pad[2u+sy, 2(v+sh)+sx, ci] where
    img_pad has one row/col of zero padding before the image (the conv's
    SAME padding) and trailing zeros.
    """
    B, H, W, _ = images.shape
    hp, wp, wl2 = _dims(H, W)
    U = hp + 2
    x = jnp.pad(images.astype(jnp.bfloat16),
                ((0, 0), (1, 2 * U - H - 1), (1, 3), (0, 0)))
    # Transpose to channel-planar FIRST: XLA already lays the NHWC image out
    # W-minor ({2,1,3,0} in the train-step HLO), so this is a relabel, and
    # the parity slices then run on a W-on-lanes layout (~3x cheaper than
    # striding the logical NHWC form: 1.8 -> 0.65 ms measured at 416/b8).
    p = x.transpose(0, 3, 1, 2)                      # (B, 3, 2U, W+4)
    qs = {}
    for sy in range(2):
        for sx in range(2):
            q = p[:, :, sy::2, sx::2]                # (B, 3, U, (W+4)/2)
            q = jnp.pad(q, ((0, 0), (0, 0), (0, 0),
                            (0, wl2 - q.shape[3])))
            qs[(sy, sx, 0)] = q                      # shift 0
            qs[(sy, sx, 1)] = jnp.concatenate(
                [q[:, :, :, 1:], jnp.zeros_like(q[:, :, :, :1])], axis=3)
    planes = [qs[(sy, sx, sh)][:, ci]
              for ci in range(_CI) for sy in range(2)
              for sx in range(2) for sh in range(2)]
    return jnp.stack(planes, axis=1).reshape(B, 24, U * wl2)


def _wmat(w: jax.Array) -> jax.Array:
    """HWIO (3,3,3,32) -> (32, 32) bf16: rows=co, cols=(ky,kx,ci) zero-padded."""
    return jnp.pad(w.astype(jnp.bfloat16).reshape(27, _CO).T, ((0, 0), (0, 5)))


def _tap_rows(planes_ref, py: int, px: int, i0, TP: int, wl2: int):
    """The 27 im2col rows for phase (py, px), aligned lane slices only."""
    rows = []
    for ky in range(3):
        for kx in range(3):
            for ci in range(_CI):
                sy, du = (py + ky) % 2, (py + ky) // 2
                sx, sh = (px + kx) % 2, (px + kx) // 2
                pidx = _plane_idx(ci, sy, sx, sh)
                rows.append(planes_ref[0, pidx,
                                       pl.ds((i0 + du) * wl2, TP * wl2)])
    return rows


def _lane_mask(TP: int, wp: int, wl2: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TP * wl2), 1) % wl2
    return lane < wp                     # valid pooled columns


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _k1_conv_stats(planes_ref, w_ref, yph_ref, stats_ref, acc_ref, *,
                   TP: int, wp: int, wl2: int):
    """Per-phase conv dots; emits y_phases (bf16) and global sum/sumsq."""
    b, j = pl.program_id(0), pl.program_id(1)
    i0 = j * TP
    mask = _lane_mask(TP, wp, wl2)

    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for p, (py, px) in enumerate(_PHASES):
        col = jnp.stack(_tap_rows(planes_ref, py, px, i0, TP, wl2), axis=0)
        col = jnp.pad(col, ((0, 5), (0, 0)))
        y = jax.lax.dot_general(w_ref[:], col, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        yb = y.astype(jnp.bfloat16)
        yph_ref[0, p] = yb
        # stats from the bf16-rounded activation — the unfused path
        # materializes the conv output in bf16 before the BN reductions
        ym = jnp.where(mask, yb.astype(jnp.float32), 0.0)
        acc_ref[0, :] += jnp.sum(ym, axis=1)
        acc_ref[1, :] += jnp.sum(ym * ym, axis=1)

    last = jnp.logical_and(b == pl.num_programs(0) - 1,
                           j == pl.num_programs(1) - 1)

    @pl.when(last)
    def _emit():
        stats_ref[...] = acc_ref[...]


# the bf16-rounded leaky slope (round(0.1) in bf16); a plain Python float so
# importing this module inside a trace (darknet.apply's lazy import) never
# touches jax at module scope
_SLOPE = 0.10009765625
assert _SLOPE == float(np.asarray(0.1, dtype="bfloat16"))


def _rb(v32):
    """Round-trip through bf16: the f32 value the unfused path would hold
    after materializing in bf16.  All compares/maxes run on these in f32 —
    Mosaic on this target cannot compare bf16 vectors, and rounding is
    monotone so max/compare commute with the final bf16 cast."""
    return v32.astype(jnp.bfloat16).astype(jnp.float32)


def _k2_bn_pool(yph_ref, inv_ref, shift_ref, out_ref):
    """BN apply (f32 math, bf16 out) + leaky + 4-phase max."""
    inv = inv_ref[0][:, None]
    shift = shift_ref[0][:, None]
    best = None
    for p in range(4):
        z = _rb(yph_ref[0, p].astype(jnp.float32) * inv + shift)
        a = jnp.where(z >= 0, z, _SLOPE * z)
        best = a if best is None else jnp.maximum(best, a)
    out_ref[0] = best.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _routing(yph_ref, inv, shift):
    """Recompute per-phase activations (f32 on bf16-rounded values) and the
    first-max routing masks, matching the forward pool's tie-breaking."""
    zs, acts = [], []
    for p in range(4):
        z = _rb(yph_ref[0, p].astype(jnp.float32) * inv + shift)
        a = _rb(jnp.where(z >= 0, z, _SLOPE * z))   # rounded, as pooled holds
        zs.append(z)
        acts.append(a)
    best = acts[0]
    for p in range(1, 4):
        best = jnp.maximum(best, acts[p])
    hits = []
    taken = jnp.zeros(best.shape, jnp.bool_)
    for p in range(4):
        hit = jnp.logical_and(acts[p] == best, jnp.logical_not(taken))
        taken = jnp.logical_or(taken, hit)
        hits.append(hit)
    return zs, hits


def _b1_sums(yph_ref, g_ref, inv_ref, shift_ref, mean_ref, rstd_ref,
             sums_ref, acc_ref, *, TP: int, wp: int, wl2: int):
    """Global reductions Sgz = sum(g_z), Sgx = sum(g_z * xhat) per channel."""
    b, j = pl.program_id(0), pl.program_id(1)
    inv = inv_ref[0][:, None]
    shift = shift_ref[0][:, None]
    mean = mean_ref[0][:, None]
    rstd = rstd_ref[0][:, None]

    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = g_ref[0].astype(jnp.float32)
    zs, hits = _routing(yph_ref, inv, shift)
    for p in range(4):
        gz = jnp.where(hits[p], g, 0.0)
        gz = gz * jnp.where(zs[p] >= 0, 1.0, _SLOPE)
        xhat = (yph_ref[0, p].astype(jnp.float32) - mean) * rstd
        acc_ref[0, :] += jnp.sum(gz, axis=1)
        acc_ref[1, :] += jnp.sum(gz * xhat, axis=1)

    last = jnp.logical_and(b == pl.num_programs(0) - 1,
                           j == pl.num_programs(1) - 1)

    @pl.when(last)
    def _emit():
        sums_ref[...] = acc_ref[...]


def _b2_dw(yph_ref, g_ref, planes_ref, inv_ref, shift_ref, mean_ref,
           rstd_ref, c1_ref, c2_ref, dw_ref, acc_ref, *,
           TP: int, wp: int, wl2: int):
    """dW = sum over phases/pixels of im2col x dy, dy from the BN backward."""
    b, j = pl.program_id(0), pl.program_id(1)
    i0 = j * TP
    inv = inv_ref[0][:, None]
    shift = shift_ref[0][:, None]
    mean = mean_ref[0][:, None]
    rstd = rstd_ref[0][:, None]
    c1 = c1_ref[0][:, None]
    c2 = c2_ref[0][:, None]
    mask = _lane_mask(TP, wp, wl2)

    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = g_ref[0].astype(jnp.float32)
    zs, hits = _routing(yph_ref, inv, shift)
    for p, (py, px) in enumerate(_PHASES):
        gz = jnp.where(hits[p], g, 0.0)
        gz = gz * jnp.where(zs[p] >= 0, 1.0, _SLOPE)
        xhat = (yph_ref[0, p].astype(jnp.float32) - mean) * rstd
        dy = inv * gz - c1 - xhat * c2
        dy = jnp.where(mask, dy, 0.0).astype(jnp.bfloat16)   # (CO, N)
        col = jnp.stack(_tap_rows(planes_ref, py, px, i0, TP, wl2), axis=0)
        col = jnp.pad(col, ((0, 5), (0, 0)))                  # (32, N)
        acc_ref[...] += jax.lax.dot_general(
            col, dy, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (32tap, CO)

    last = jnp.logical_and(b == pl.num_programs(0) - 1,
                           j == pl.num_programs(1) - 1)

    @pl.when(last)
    def _emit():
        dw_ref[...] = acc_ref[...]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _grid_specs(B: int, hp: int, wl2: int, TP: int):
    U = hp + 2
    grid = (B, hp // TP)
    planes_spec = pl.BlockSpec((1, 24, U * wl2), lambda b, j: (b, 0, 0))
    yph_spec = pl.BlockSpec((1, 4, _CO, TP * wl2), lambda b, j: (b, 0, 0, j))
    pooled_spec = pl.BlockSpec((1, _CO, TP * wl2), lambda b, j: (b, 0, j))
    vec_spec = pl.BlockSpec((1, _CO), lambda b, j: (0, 0))
    return grid, planes_spec, yph_spec, pooled_spec, vec_spec


def _fwd_impl(planes, wmat, scale, bias, *, B, H, W, interpret=False,
              axis_name=None):
    from jax.experimental.pallas import tpu as pltpu
    hp, wp, wl2 = _dims(H, W)
    grid, planes_spec, yph_spec, pooled_spec, vec_spec = \
        _grid_specs(B, hp, wl2, _TP)

    yph, stats = pl.pallas_call(
        functools.partial(_k1_conv_stats, TP=_TP, wp=wp, wl2=wl2),
        out_shape=(jax.ShapeDtypeStruct((B, 4, _CO, hp * wl2), jnp.bfloat16),
                   jax.ShapeDtypeStruct((2, _CO), jnp.float32)),
        grid=grid,
        in_specs=[planes_spec, pl.BlockSpec((_CO, _CO), lambda b, j: (0, 0))],
        out_specs=(yph_spec, pl.BlockSpec((2, _CO), lambda b, j: (0, 0))),
        scratch_shapes=[pltpu.VMEM((2, _CO), jnp.float32)],
        interpret=interpret,
    )(planes, wmat)

    n = B * H * W
    if axis_name is not None:
        # sync-BN across the data axis: per-shard sum/sumsq partials psum to
        # the global statistics (the unfused path gets the same semantics
        # from GSPMD's reduction over the sharded batch axis)
        stats = jax.lax.psum(stats, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    mean = stats[0] / n
    var = stats[1] / n - mean * mean
    inv = scale * jax.lax.rsqrt(var + _EPS)
    shift = bias - mean * inv

    pooled = pl.pallas_call(
        _k2_bn_pool,
        out_shape=jax.ShapeDtypeStruct((B, _CO, hp * wl2), jnp.bfloat16),
        grid=grid,
        in_specs=[yph_spec, vec_spec, vec_spec],
        out_specs=pooled_spec,
        interpret=interpret,
    )(yph, inv.reshape(1, _CO), shift.reshape(1, _CO))
    return pooled, mean, var, yph, inv, shift


def _bwd_impl(planes, yph, g_planar, scale, mean, var, inv, shift, *,
              B, H, W, interpret=False, axis_name=None):
    from jax.experimental.pallas import tpu as pltpu
    hp, wp, wl2 = _dims(H, W)
    grid, planes_spec, yph_spec, pooled_spec, vec_spec = \
        _grid_specs(B, hp, wl2, _TP)
    rstd = jax.lax.rsqrt(var + _EPS)
    v = lambda a: a.reshape(1, _CO)

    sums = pl.pallas_call(
        functools.partial(_b1_sums, TP=_TP, wp=wp, wl2=wl2),
        out_shape=jax.ShapeDtypeStruct((2, _CO), jnp.float32),
        grid=grid,
        in_specs=[yph_spec, pooled_spec, vec_spec, vec_spec, vec_spec,
                  vec_spec],
        out_specs=pl.BlockSpec((2, _CO), lambda b, j: (0, 0)),
        scratch_shapes=[pltpu.VMEM((2, _CO), jnp.float32)],
        interpret=interpret,
    )(yph, g_planar, v(inv), v(shift), v(mean), v(rstd))
    # LOCAL sums stay the returned cotangent contributions (shard_map's
    # transpose psums the cotangents of replicated inputs); the GLOBAL sums
    # feed c1/c2, which every shard must agree on (they divide by global n)
    sgz, sgx = sums[0], sums[1]

    n = B * H * W
    if axis_name is not None:
        gsums = jax.lax.psum(sums, axis_name)
        n = n * jax.lax.psum(1, axis_name)
        gsgz, gsgx = gsums[0], gsums[1]
    else:
        gsgz, gsgx = sgz, sgx
    c1 = inv * gsgz / n
    c2 = inv * gsgx / n

    dw_pad = pl.pallas_call(
        functools.partial(_b2_dw, TP=_TP, wp=wp, wl2=wl2),
        out_shape=jax.ShapeDtypeStruct((_CO, _CO), jnp.float32),
        grid=grid,
        in_specs=[yph_spec, pooled_spec, planes_spec, vec_spec, vec_spec,
                  vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=pl.BlockSpec((_CO, _CO), lambda b, j: (0, 0)),
        scratch_shapes=[pltpu.VMEM((_CO, _CO), jnp.float32)],
        interpret=interpret,
    )(yph, g_planar, planes, v(inv), v(shift), v(mean), v(rstd), v(c1),
      v(c2))

    dw = dw_pad[:27].reshape(3, 3, _CI, _CO)
    dscale = sgx     # d z / d scale = xhat
    dbias = sgz
    return dw, dscale, dbias


# ---------------------------------------------------------------------------
# custom-vjp core at the planar boundary
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _stem_core(planes, w, scale, bias, B, H, W, interpret, axis_name):
    pooled, mean, var, _, _, _ = _fwd_impl(
        planes, _wmat(w), scale, bias, B=B, H=H, W=W, interpret=interpret,
        axis_name=axis_name)
    return pooled, mean, var


def _stem_core_fwd(planes, w, scale, bias, B, H, W, interpret, axis_name):
    pooled, mean, var, yph, inv, shift = _fwd_impl(
        planes, _wmat(w), scale, bias, B=B, H=H, W=W, interpret=interpret,
        axis_name=axis_name)
    return (pooled, mean, var), (planes, yph, scale, mean, var, inv, shift)


def _stem_core_bwd(B, H, W, interpret, axis_name, res, cts):
    planes, yph, scale, mean, var, inv, shift = res
    g_pooled, _g_mean, _g_var = cts   # batch stats feed running stats only
    dw, dscale, dbias = _bwd_impl(
        planes, yph, g_pooled.astype(jnp.bfloat16), scale, mean, var, inv,
        shift, B=B, H=H, W=W, interpret=interpret, axis_name=axis_name)
    return jnp.zeros_like(planes), dw, dscale, dbias


_stem_core.defvjp(_stem_core_fwd, _stem_core_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def stem_conv_bn_pool_train(images, w, scale, bias, *, interpret=False,
                            axis_name=None):
    """Fused stem forward for training.

    Args:
      images: (B, H, W, 3) float32/bf16 in [0, 1] (normalized RGB).
      w: (3, 3, 3, 32) f32 HWIO conv weights.
      scale, bias: (32,) f32 BN affine parameters.
      axis_name: set when called inside ``shard_map`` over a data axis
        (see :func:`stem_conv_bn_pool_train_sharded`): the BN statistics
        and the backward's c1/c2 reductions psum over it (sync-BN), while
        the returned parameter cotangents stay per-shard (shard_map's
        transpose psums replicated-input cotangents).

    Returns (pooled, batch_mean, batch_var_biased):
      pooled: (B, H//2, W//2, 32) bf16 — identical (up to f32 reduction
        order in the statistics) to
        ``max_pool(leaky(batch_norm_train(conv2d(x, w))), 2, 2)``.
      batch stats: (32,) f32 — for the caller's running-stat update.

    Differentiable in (w, scale, bias); the image cotangent is a structural
    zero (the stem is the first layer).
    """
    B, H, W, _ = images.shape
    hp, wp, wl2 = _dims(H, W)
    planes = _prep_planes(images)
    pooled_pl, mean, var = _stem_core(planes, w, scale, bias, B, H, W,
                                      interpret or FORCE_INTERPRET, axis_name)
    pooled = pooled_pl.reshape(B, _CO, hp, wl2)[:, :, :, :wp]
    return pooled.transpose(0, 2, 3, 1), mean, var


def stem_conv_bn_pool_train_sharded(images, w, scale, bias, mesh, *,
                                    interpret=False):
    """:func:`stem_conv_bn_pool_train` under a ("data","model") mesh.

    Mosaic custom calls have no GSPMD partitioning rule, so the bare kernel
    inside pjit would force a full-batch gather onto every device.  The stem
    is per-sample except for the BN statistics, so ``shard_map`` over the
    mesh's ``data`` axis runs the kernels per-device on the local batch
    shard, with one (2, 32) psum for the statistics (sync-BN — the same
    semantics GSPMD gives the unfused path) and one in the backward for
    c1/c2.  Parameters enter replicated (GSPMD all-gathers the tiny conv_1
    shard when tensor parallelism shards it); their cotangents psum in the
    shard_map transpose.  ``check_vma=False`` because the varying-axes
    checker cannot see through the Mosaic custom call — same recipe as
    ``ops/pallas_kernels.max_corner_confidence_sharded``.
    """
    from jax.sharding import PartitionSpec as P
    fn = functools.partial(stem_conv_bn_pool_train, interpret=interpret,
                           axis_name="data")
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("data"), P(), P(), P()),
        out_specs=(P("data"), P(), P()),
        check_vma=False)(images, w, scale, bias)


# ---------------------------------------------------------------------------
# inference stem (folded serving path): conv + bias + leaky + pool, one kernel
# ---------------------------------------------------------------------------


def _k_serve(planes_ref, w_ref, b_ref, out_ref, *, TP: int, wp: int,
             wl2: int):
    """Folded-serving stem: per-phase conv dots + bias + leaky + 4-phase max.

    Matches ``apply_folded``'s unfused numerics: the conv output rounds to
    bf16, the f32 bias adds in f32, the sum rounds to bf16, leaky runs on
    that (all compares in f32 on bf16-rounded values — Mosaic bf16-compare
    limitation, value-identical by rounding monotonicity)."""
    j = pl.program_id(1)
    i0 = j * TP
    bias = b_ref[0][:, None]
    best = None
    for p, (py, px) in enumerate(_PHASES):
        col = jnp.stack(_tap_rows(planes_ref, py, px, i0, TP, wl2), axis=0)
        col = jnp.pad(col, ((0, 5), (0, 0)))
        y = jax.lax.dot_general(w_ref[:], col, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        z = _rb(_rb(y) + bias)
        a = jnp.where(z >= 0, z, _SLOPE * z)
        best = a if best is None else jnp.maximum(best, a)
    out_ref[0] = best.astype(jnp.bfloat16)


def stem_conv_pool_infer(images, w, bias, *, interpret=False):
    """Fused folded-serving stem forward.

    Args:
      images: (B, H, W, 3) float NHWC in [0, 1].
      w: (3, 3, 3, 32) conv weights with BN folded in (``fold_batchnorm``).
      bias: (32,) f32 folded bias.

    Returns (B, H//2, W//2, 32) bf16 —
    ``max_pool(leaky((conv2d(x, w).astype(bf16) + b).astype(bf16)), 2, 2)``.
    """
    B, H, W, _ = images.shape
    hp, wp, wl2 = _dims(H, W)
    planes = _prep_planes(images)
    grid, planes_spec, _, pooled_spec, vec_spec = _grid_specs(B, hp, wl2, _TP)
    pooled_pl = pl.pallas_call(
        functools.partial(_k_serve, TP=_TP, wp=wp, wl2=wl2),
        out_shape=jax.ShapeDtypeStruct((B, _CO, hp * wl2), jnp.bfloat16),
        grid=grid,
        in_specs=[planes_spec, pl.BlockSpec((_CO, _CO), lambda b, j: (0, 0)),
                  vec_spec],
        out_specs=pooled_spec,
        interpret=interpret or FORCE_INTERPRET,
    )(planes, _wmat(w), bias.reshape(1, _CO))
    pooled = pooled_pl.reshape(B, _CO, hp, wl2)[:, :, :, :wp]
    return pooled.transpose(0, 2, 3, 1)
