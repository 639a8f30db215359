"""Headline benchmark: single-chip 416×416 inference throughput (fps).

Runs the flagship yolo-pose net (Darknet-19 + passthrough + pose head,
BN folded, bf16 compute) INCLUDING the on-device grid decode — i.e. the
per-frame work of ``valid.py`` minus host PnP.

Methodology: N net executions are chained on-device inside one jitted
``lax.fori_loop`` (iteration i+1's input depends on iteration i's output),
so a single host sync times N real sequential executions.  Naive
dispatch-loop timing is wrong on this platform: dispatch is async and
``block_until_ready`` returns long before the device finishes through the
axon tunnel (observed 500k "fps" — past the chip's theoretical peak).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the CVPR'18 paper's real-time claim, ~50 fps on a Titan X
(reference README.md:11 / arXiv:1711.08848); the repo itself publishes no
numbers (BASELINE.md).
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 50.0  # Titan X real-time claim from the paper
BATCH = 128          # throughput-optimal on v5e (32→2.4k, 64→3.1k, 128→4.2k fps)
SIZE = 416
CHAIN = 30


def main():
    from singleshotpose_tpu.models.darknet import fold_batchnorm
    from singleshotpose_tpu.ops.decode import best_boxes, decode_grid
    from singleshotpose_tpu.zoo import yolo_pose_single

    net = yolo_pose_single()
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    folded = jax.device_put(fold_batchnorm(net, params, bstats))
    K, C, nA = net.num_keypoints, net.num_classes, net.num_anchors

    @partial(jax.jit, static_argnames=("iters",))
    def chained_infer(p, x, iters):
        def body(i, carry):
            x, acc = carry
            head = net.apply_folded(p, x, compute_dtype=jnp.bfloat16)
            boxes = best_boxes(decode_grid(head.astype(jnp.float32), K, C, nA))
            # data dependency: next input is perturbed by this step's output
            return (x * 0.999 + jnp.mean(boxes) * 1e-6, acc + boxes)

        x, acc = jax.lax.fori_loop(
            0, iters, body, (x, jnp.zeros((x.shape[0], 2 * K + 3), x.dtype)))
        return acc

    x = jax.device_put(jnp.asarray(
        np.random.RandomState(0).rand(BATCH, SIZE, SIZE, 3), jnp.float32))

    out = chained_infer(folded, x, CHAIN)       # compile + warm
    float(jnp.sum(out))                          # full host sync
    t0 = time.perf_counter()
    out = chained_infer(folded, x, CHAIN)
    float(jnp.sum(out))                          # sync: all CHAIN iters done
    dt = time.perf_counter() - t0

    fps = BATCH * CHAIN / dt
    print(json.dumps({
        "metric": "inference_fps_416_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
