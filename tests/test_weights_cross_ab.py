"""Cross-A/B of the weights codec against the reference's OWN torch writer:
the reference Darknet saves a .weights file; our codec loads it bit-exactly
and the two forwards agree — closing the loop beyond synthetic-buffer tests."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from singleshotpose_tpu import weights as W
from singleshotpose_tpu.config import parse_cfg
from singleshotpose_tpu.models.darknet import DarknetSpec


@pytest.fixture
def ref_darknet(reference_dir, monkeypatch):
    torch = pytest.importorskip("torch")
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    monkeypatch.syspath_prepend(reference_dir)
    for mod in ("darknet", "region_loss", "cfg", "utils"):
        sys.modules.pop(mod, None)
    import darknet as ref_darknet_mod
    yield ref_darknet_mod
    for mod in ("darknet", "region_loss", "cfg", "utils"):
        sys.modules.pop(mod, None)


def test_load_reference_saved_weights_bit_exact(ref_darknet, reference_dir,
                                                tmp_path):
    torch = pytest.importorskip("torch")
    cfgfile = os.path.join(reference_dir, "cfg", "yolo-pose.cfg")

    model = ref_darknet.Darknet(cfgfile)
    model.seen = 12345
    path = str(tmp_path / "ref_written.weights")
    model.save_weights(path)

    spec = DarknetSpec(parse_cfg(cfgfile))
    header, params, bstats = W.load_weights(spec, path)
    assert header.seen == 12345

    # bit-exact parameter comparison against the live torch modules
    convs = [m[0] for m in model.models if hasattr(m, "__getitem__")
             and hasattr(m[0], "weight")]
    specs = spec.conv_specs()
    assert len(convs) == len(specs) == 23
    for cspec, conv in zip(specs, convs):
        ours = np.asarray(params[cspec.name]["w"]).transpose(3, 2, 0, 1)
        np.testing.assert_array_equal(ours, conv.weight.detach().numpy())

    # forward agreement on the full net
    rng = np.random.RandomState(0)
    img = rng.rand(1, 416, 416, 3).astype(np.float32)
    with torch.no_grad():
        model.eval()
        ref_out = model(torch.from_numpy(
            img.transpose(0, 3, 1, 2).copy())).numpy()
    ours_out = np.asarray(spec.apply(params, jnp.asarray(img),
                                     batch_stats=bstats, train=False))
    ref_nhwc = ref_out.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours_out, ref_nhwc, rtol=2e-4, atol=2e-5)


def test_reference_loads_our_saved_weights(ref_darknet, reference_dir,
                                           tmp_path):
    """Round-trip the other way: the reference torch loader reads a file our
    codec wrote."""
    torch = pytest.importorskip("torch")
    import jax
    cfgfile = os.path.join(reference_dir, "cfg", "yolo-pose.cfg")
    spec = DarknetSpec(parse_cfg(cfgfile))
    params, bstats = spec.init_params(jax.random.PRNGKey(3))
    path = str(tmp_path / "ours_written.weights")
    W.save_weights(spec, jax.device_get(params), jax.device_get(bstats),
                   path, seen=777)

    model = ref_darknet.Darknet(cfgfile)
    model.load_weights(path)
    assert int(model.seen) == 777
    first_conv = model.models[0][0]
    ours_w = np.asarray(params["conv_1"]["w"]).transpose(3, 2, 0, 1)
    np.testing.assert_array_equal(first_conv.weight.detach().numpy(), ours_w)
