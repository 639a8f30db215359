"""Minimum end-to-end slice, as a script (the reference ships this flow as
``valid.ipynb``): cfg → weights → forward → decode → PnP → metrics → overlay.

Usage:
    python examples/demo_inference.py --datacfg cfg/ape.data \
        --modelcfg cfg/yolo-pose.cfg --weightfile backup/ape/model.weights \
        --image LINEMOD/ape/JPEGImages/000000.jpg [--out overlay.png]

With no --weightfile the net runs randomly initialized (pipeline smoke).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datacfg", required=True)
    ap.add_argument("--modelcfg", default="yolo-pose")
    ap.add_argument("--weightfile", default=None)
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", default=None, help="save overlay PNG here")
    args = ap.parse_args()

    from singleshotpose_tpu import weights as W
    from singleshotpose_tpu.cli import _resolve_model
    from singleshotpose_tpu.config import data_config_from_options, read_data_cfg
    from singleshotpose_tpu.data.augment import resize_nearest
    from singleshotpose_tpu.data.pipeline import load_image
    from singleshotpose_tpu.drivers import load_spec
    from singleshotpose_tpu.evaluate import EvalContext
    from singleshotpose_tpu.models.darknet import fold_batchnorm
    from singleshotpose_tpu.ops.decode import best_boxes, decode_grid
    from singleshotpose_tpu.ops.pnp import pnp

    dcfg = data_config_from_options(read_data_cfg(args.datacfg))
    spec = load_spec(_resolve_model(args.modelcfg))
    if args.weightfile:
        _, params, bstats = W.load_weights(spec, args.weightfile)
    else:
        params, bstats = spec.init_params(jax.random.PRNGKey(0))
    folded = fold_batchnorm(spec, params, bstats)

    ctx = EvalContext.from_data_config(dcfg)
    tw, th = spec.net.test_width, spec.net.test_height
    img = load_image(args.image)
    x = jnp.asarray(resize_nearest(img, tw, th), jnp.float32)[None] / 255.0

    head = spec.apply_folded(folded, x, compute_dtype=jnp.bfloat16)
    box = np.asarray(best_boxes(decode_grid(
        head.astype(jnp.float32), spec.num_keypoints, spec.num_classes,
        spec.num_anchors)))[0]
    corners = box[:18].reshape(9, 2) * [dcfg.width, dcfg.height]
    conf = box[18]

    R, t = pnp(ctx.points_3d, corners.astype(np.float32), ctx.intrinsics)
    R, t = np.asarray(R), np.asarray(t)
    print(f"confidence: {conf:.3f}")
    print(f"keypoints (px):\n{np.round(corners, 1)}")
    print(f"R:\n{np.round(R, 4)}\nt: {np.round(t, 4)}")

    if args.out:
        from PIL import Image, ImageDraw
        im = Image.fromarray(img).convert("RGB")
        draw = ImageDraw.Draw(im)
        # 8 box corners are keypoints 1..8: draw the 12 box edges
        c = corners[1:]
        edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7),
                 (6, 7), (0, 4), (1, 5), (2, 6), (3, 7)]
        for a, b in edges:
            draw.line([tuple(c[a]), tuple(c[b])], fill=(0, 255, 0), width=2)
        draw.ellipse([corners[0][0] - 3, corners[0][1] - 3,
                      corners[0][0] + 3, corners[0][1] + 3],
                     fill=(255, 0, 0))
        im.save(args.out)
        print(f"overlay saved to {args.out}")


if __name__ == "__main__":
    main()
