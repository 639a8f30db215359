"""Multi-host helpers on the single-process virtual mesh (the standard JAX
testing degenerate: process_count()==1 but the global-array APIs and the
sharded step run the real code path)."""

import numpy as np

import jax
import jax.numpy as jnp

from singleshotpose_tpu.parallel.multihost import (global_batch,
                                                   initialize_distributed,
                                                   process_local_indices)
from singleshotpose_tpu.parallel.sharding import make_mesh


def test_initialize_noop_single_process():
    initialize_distributed(num_processes=1)   # must not raise


def test_process_local_indices_partitions():
    a = process_local_indices(100, process_id=0, num_processes=4)
    b = process_local_indices(100, process_id=3, num_processes=4)
    assert len(a) == len(b) == 25
    assert a[0] == 0 and b[0] == 75
    # remainder truncated for rectangular batches
    c = process_local_indices(103, process_id=3, num_processes=4)
    assert c[-1] == 99


def test_global_batch_assembles_and_feeds_step():
    from singleshotpose_tpu.config import parse_cfg
    from singleshotpose_tpu.models.darknet import DarknetSpec
    from singleshotpose_tpu.ops.losses import RegionLossConfig
    from singleshotpose_tpu.training import init_train_state, make_train_step
    from test_training import TINY_CFG, _tiny_target
    import tempfile

    mesh = make_mesh(jax.devices()[:4], dp=4, mp=1)
    rng = np.random.RandomState(0)
    imgs = rng.rand(8, 64, 64, 3).astype(np.float32)
    labels = _tiny_target(8)

    gi, gl = global_batch(mesh, imgs, labels)
    assert gi.shape == (8, 64, 64, 3)
    assert gi.sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(gi), imgs)

    with tempfile.NamedTemporaryFile("w", suffix=".cfg") as f:
        f.write(TINY_CFG)
        f.flush()
        net = DarknetSpec(parse_cfg(f.name))
    state = init_train_state(*net.init_params(jax.random.PRNGKey(0)))
    step = make_train_step(net, RegionLossConfig.single(), weight_decay=0.0,
                           momentum=0.9, compute_dtype=None, donate=False)
    state, stats = step(state, gi, gl, 1e-4, 100)
    assert np.isfinite(float(stats["loss"]))
