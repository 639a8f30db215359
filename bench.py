"""Headline benchmark: single-chip 416×416 inference throughput (fps).

Runs the flagship yolo-pose net (Darknet-19 + passthrough + pose head,
BN folded, bf16 compute) end-to-end INCLUDING the on-device grid decode to
the best box — i.e. the work ``valid.py`` does per frame minus host PnP.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the CVPR'18 paper's real-time claim, ~50 fps on a Titan X
(reference README.md:11 / arXiv:1711.08848); the repo itself publishes no
numbers (BASELINE.md).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 50.0  # Titan X real-time claim from the paper
BATCH = 32
SIZE = 416
WARMUP = 3
ITERS = 20


def main():
    from singleshotpose_tpu.models.darknet import fold_batchnorm
    from singleshotpose_tpu.ops.decode import best_boxes, decode_grid
    from singleshotpose_tpu.zoo import yolo_pose_single

    net = yolo_pose_single()
    params, bstats = net.init_params(jax.random.PRNGKey(0))
    folded = fold_batchnorm(net, params, bstats)
    K, C, nA = net.num_keypoints, net.num_classes, net.num_anchors

    @jax.jit
    def infer(p, images):
        head = net.apply_folded(p, images, compute_dtype=jnp.bfloat16)
        return best_boxes(decode_grid(head.astype(jnp.float32), K, C, nA))

    images = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    folded = jax.device_put(folded)
    images = jax.device_put(images)

    for _ in range(WARMUP):
        infer(folded, images).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = infer(folded, images)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "inference_fps_416_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
