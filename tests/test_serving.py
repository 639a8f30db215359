"""Serving export (serving.py): jax.export artifacts + AOT compile.

The deployable claim: a saved artifact reloads with jax alone and produces
bit-identical boxes to the in-process folded serving path — for bf16-folded
and int8-quantized weights, fixed and polymorphic batch, u8 and float input.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from singleshotpose_tpu import serving as S
from singleshotpose_tpu.models import quantize as Q
from singleshotpose_tpu.models.darknet import fold_batchnorm
from singleshotpose_tpu.ops.decode import best_boxes, decode_grid

from test_quantize import _tiny_spec


@pytest.fixture(scope="module")
def tiny():
    spec = _tiny_spec()
    params, bstats = spec.init_params(jax.random.PRNGKey(3))
    rng = np.random.RandomState(11)
    for name in bstats:
        n = bstats[name]["mean"].shape[0]
        bstats[name] = {
            "mean": jnp.asarray(rng.randn(n).astype(np.float32) * 0.1),
            "var": jnp.asarray(rng.rand(n).astype(np.float32) + 0.5)}
    folded = fold_batchnorm(spec, params, bstats)
    imgs = np.random.RandomState(0).randint(0, 256, (4, 64, 64, 3), np.uint8)
    return spec, folded, imgs


def _direct_boxes(spec, folded, imgs):
    # jitted: the export runs as ONE compiled program, so the apples-to-
    # apples reference is the jitted serving fn (eager op-by-op execution
    # fuses differently → f32 drift at the 1e-8 level)
    fn = jax.jit(S.make_serving_fn(spec, folded, pick=("best",),
                                   compute_dtype=jnp.float32))
    return fn(jnp.asarray(imgs))


def test_roundtrip_bitexact(tmp_path, tiny):
    spec, folded, imgs = tiny
    exp = S.export_serving(spec, folded, width=64, height=64, batch=4,
                           pick=("best",), compute_dtype=jnp.float32)
    path = str(tmp_path / "m.sspx")
    S.save_exported(path, exp)
    serve = S.load_serving(path)
    got = serve(jnp.asarray(imgs))
    want = _direct_boxes(spec, folded, imgs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_polymorphic_batch(tmp_path, tiny):
    """batch=None exports a symbolic leading dim: one artifact, any batch."""
    spec, folded, imgs = tiny
    exp = S.export_serving(spec, folded, width=64, height=64, batch=None,
                           pick=("best",), compute_dtype=jnp.float32)
    path = str(tmp_path / "m.sspx")
    S.save_exported(path, exp)
    serve = S.load_serving(path)
    for b in (1, 3, 4):
        got = serve(jnp.asarray(imgs[:b]))
        want = _direct_boxes(spec, folded, imgs[:b])
        assert got.shape == (b, 21)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantized_export_matches_inprocess(tmp_path, tiny):
    spec, folded, imgs = tiny
    x = jnp.asarray(imgs, jnp.float32) / 255.0
    amax = Q.calibrate_activations(spec, folded, x, compute_dtype=None)
    qp = Q.quantize_folded(spec, folded, amax)
    exp = S.export_serving(spec, qp, width=64, height=64, batch=4,
                           pick=("best",), compute_dtype=jnp.float32)
    path = str(tmp_path / "q.sspx")
    S.save_exported(path, exp)
    serve = S.load_serving(path)
    got = serve(jnp.asarray(imgs))
    want = jax.jit(S.make_serving_fn(spec, qp, pick=("best",),
                                     compute_dtype=jnp.float32))(
                                         jnp.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_grid_pick_returns_decoded(tiny):
    spec, folded, imgs = tiny
    exp = S.export_serving(spec, folded, width=64, height=64, batch=2,
                           pick=None, compute_dtype=jnp.float32)
    out = exp.call(jnp.asarray(imgs[:2]))
    want = jax.jit(S.make_serving_fn(spec, folded, pick=None,
                                     compute_dtype=jnp.float32))(
                                         jnp.asarray(imgs[:2]))
    got_leaves = jax.tree.leaves(out)
    want_leaves = jax.tree.leaves(want)
    assert len(got_leaves) == len(want_leaves)
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_float_input_dtype(tmp_path, tiny):
    spec, folded, imgs = tiny
    exp = S.export_serving(spec, folded, width=64, height=64, batch=4,
                           pick=("best",), compute_dtype=jnp.float32,
                           input_dtype=jnp.float32)
    x = jnp.asarray(imgs, jnp.float32) / 255.0
    got = exp.call(x)
    want = jax.jit(S.make_serving_fn(spec, folded, pick=("best",),
                                     compute_dtype=jnp.float32))(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_aot_serving_no_retrace(tiny):
    """aot_serving returns a Compiled: calls run without tracing/compiling."""
    spec, folded, imgs = tiny
    compiled = S.aot_serving(spec, folded, batch=4, width=64, height=64,
                             pick=("best",), compute_dtype=jnp.float32)
    got = compiled(jnp.asarray(imgs))
    want = _direct_boxes(spec, folded, imgs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # wrong shape must fail loudly, not retrace
    with pytest.raises(Exception):
        compiled(jnp.asarray(imgs[:2]))


def test_cli_export_roundtrip(tmp_path, tiny):
    """`ssp export` on a real cfg + .weights file end-to-end."""
    from singleshotpose_tpu import weights as W
    from singleshotpose_tpu.cli import main

    spec, folded, imgs = tiny
    params, bstats = spec.init_params(jax.random.PRNGKey(5))
    cfgfile = tmp_path / "tiny.cfg"
    cfgfile.write_text(spec.to_cfg_text() if hasattr(spec, "to_cfg_text")
                       else _blocks_to_cfg(spec.blocks))
    wfile = tmp_path / "t.weights"
    W.save_weights(spec, params, bstats, str(wfile))
    out = tmp_path / "m.sspx"
    rc = main(["export", "--modelcfg", str(cfgfile), "--weightfile",
               str(wfile), "--out", str(out), "--width", "64", "--height",
               "64", "--batch", "2", "--pick", "best",
               "--compute", "float32"])
    assert rc == 0 and out.exists()
    serve = S.load_serving(str(out))
    got = serve(jnp.asarray(imgs[:2]))
    want = _direct_boxes(spec, fold_batchnorm(spec, params, bstats), imgs[:2])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cli_export_from_orbax(tmp_path, tiny):
    """`ssp export --orbax_dir`: training checkpoint → serving artifact."""
    from singleshotpose_tpu.checkpoint import OrbaxCheckpointer
    from singleshotpose_tpu.cli import main
    from singleshotpose_tpu.training import init_train_state

    spec, _, imgs = tiny
    params, bstats = spec.init_params(jax.random.PRNGKey(7))
    state = init_train_state(params, bstats)
    ckpt = OrbaxCheckpointer(str(tmp_path / "ckpt"))
    ckpt.save(3, state, wait=True)
    ckpt.close()
    cfgfile = tmp_path / "tiny.cfg"
    cfgfile.write_text(_blocks_to_cfg(spec.blocks))
    out = tmp_path / "m.sspx"
    rc = main(["export", "--modelcfg", str(cfgfile), "--orbax_dir",
               str(tmp_path / "ckpt"), "--out", str(out), "--width", "64",
               "--height", "64", "--batch", "2", "--compute", "float32"])
    assert rc == 0 and out.exists()
    got = S.load_serving(str(out))(jnp.asarray(imgs[:2]))
    want = _direct_boxes(spec, fold_batchnorm(spec, params, bstats),
                         imgs[:2])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _blocks_to_cfg(blocks):
    lines = []
    for b in blocks:
        lines.append(f"[{b['type']}]")
        lines.extend(f"{k}={v}" for k, v in b.items() if k != "type")
        lines.append("")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# MicroBatcher: dynamic micro-batching front end
# ---------------------------------------------------------------------------


def test_microbatcher_results_match_direct(tiny):
    """Every request through the batcher gets ITS frame's result, identical
    to calling the serving fn directly (padding rows never leak)."""
    spec, folded, _ = tiny
    serve = jax.jit(S.make_serving_fn(spec, folded, pick=("best",),
                                      compute_dtype=jnp.float32))
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 256, (11, 64, 64, 3), np.uint8)
    want = np.asarray(serve(jnp.asarray(frames)))
    with S.MicroBatcher(serve, height=64, width=64,
                        buckets=(1, 2, 4, 8), max_delay_ms=5.0) as mb:
        futs = [mb.submit(f) for f in frames]
        got = np.stack([f.result(timeout=60) for f in futs])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_microbatcher_coalesces_to_buckets(tiny):
    """Requests queued before the worker starts coalesce into ONE padded
    bucket call (5 requests -> one batch-8 call), and every batch shape the
    serving fn ever sees is a configured bucket size."""
    spec, folded, _ = tiny
    inner = jax.jit(S.make_serving_fn(spec, folded, pick=("best",),
                                      compute_dtype=jnp.float32))
    calls = []

    def spy(imgs):
        calls.append(imgs.shape[0])
        return inner(imgs)

    rng = np.random.RandomState(6)
    frames = rng.randint(0, 256, (5, 64, 64, 3), np.uint8)
    mb = S.MicroBatcher(spy, height=64, width=64, buckets=(1, 2, 4, 8),
                        max_delay_ms=1.0, start=False)
    futs = [mb.submit(f) for f in frames]
    mb.start()
    res = [f.result(timeout=60) for f in futs]
    mb.close()
    assert calls == [8]                       # one call, padded 5 -> 8
    assert all(r.shape == (21,) for r in res)  # 2K+3 box per request


def test_microbatcher_close_and_errors(tiny):
    spec, folded, _ = tiny
    serve = jax.jit(S.make_serving_fn(spec, folded, pick=("best",),
                                      compute_dtype=jnp.float32))
    mb = S.MicroBatcher(serve, height=64, width=64, buckets=(1, 2),
                        max_delay_ms=1.0)
    # wrong frame shape rejected up front
    with pytest.raises(ValueError):
        mb.submit(np.zeros((32, 32, 3), np.uint8))
    mb.close()
    with pytest.raises(RuntimeError):
        mb.submit(np.zeros((64, 64, 3), np.uint8))
    # a serving-fn failure fans out as the future's exception
    def boom(imgs):
        raise RuntimeError("kernel on fire")
    mb2 = S.MicroBatcher(boom, height=64, width=64, buckets=(1,),
                         max_delay_ms=1.0)
    fut = mb2.submit(np.zeros((64, 64, 3), np.uint8))
    with pytest.raises(RuntimeError, match="kernel on fire"):
        fut.result(timeout=60)
    mb2.close()


def test_microbatcher_per_bucket_fns(tiny):
    """A {bucket: fn} dict (the aot_serving deployment shape) routes each
    batch to its bucket's executable."""
    spec, folded, _ = tiny
    used = []

    def make(b):
        inner = jax.jit(S.make_serving_fn(spec, folded, pick=("best",),
                                          compute_dtype=jnp.float32))
        def fn(imgs):
            assert imgs.shape[0] == b
            used.append(b)
            return inner(imgs)
        return fn

    fns = {b: make(b) for b in (1, 4)}
    rng = np.random.RandomState(7)
    mb = S.MicroBatcher(fns, height=64, width=64, buckets=(1, 4),
                        max_delay_ms=1.0, start=False)
    futs = [mb.submit(rng.randint(0, 256, (64, 64, 3), np.uint8))
            for _ in range(3)]
    mb.start()
    for f in futs:
        f.result(timeout=60)
    mb.close()
    assert used and set(used) <= {1, 4}
