"""Synthetic LINEMOD-layout fixture for rehearsing the reproduce scripts.

Generates the exact on-disk layout the reference's downloads provide
(reference README.md:34-48): per-object ``LINEMOD/<obj>/{JPEGImages,mask,
labels}``, ``train.txt``/``test.txt``/``training_range.txt``, an ASCII
``<obj>.ply`` mesh, the OCCLUSION annotations (``test_occlusion.txt``
listing benchvise frames + per-object ``labels_occlusion/``), a VOC
background dir, and random-init ``.weights`` checkpoints written through
the bit-exact codec — so ``scripts/reproduce_linemod.sh`` /
``reproduce_occlusion.sh`` run end-to-end with no external data.

Frames are real projections (random pose → 9 keypoints under the LINEMOD
intrinsics), so PnP and every metric stay finite; mask files follow the
``JPEGImages→mask``, ``/00→/``, ``.jpg→.png`` path rule
(reference image.py:131).
"""
import os

import numpy as np

K = np.array([[572.4114, 0, 325.2611], [0, 573.5704, 242.0489],
              [0, 0, 1]], np.float32)
PTS = np.array([[0, 0, 0]] + [[sx * .045, sy * .035, sz * .04]
                for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
               np.float32)


def _random_pose(rng):
    w = rng.randn(3) * .5
    th = max(np.linalg.norm(w), 1e-6)
    Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    R = np.eye(3) + np.sin(th) / th * Kx + \
        (1 - np.cos(th)) / th ** 2 * Kx @ Kx
    t = np.array([rng.uniform(-.05, .05), rng.uniform(-.04, .04),
                  rng.uniform(.6, .8)])
    return R, t


def _project(R, t):
    cam = PTS @ R.T + t
    pix = cam @ K.T
    return pix[:, :2] / pix[:, 2:3]


def _label21(pix):
    lab = np.zeros(21, np.float32)
    lab[1:19:2] = pix[:, 0] / 640
    lab[2:19:2] = pix[:, 1] / 480
    lab[19:21] = [np.ptp(pix[:, 0]) / 640, np.ptp(pix[:, 1]) / 480]
    return lab


def _write_ply(path):
    v = PTS[1:]
    ply = ["ply", "format ascii 1.0", f"element vertex {len(v)}",
           "property float x", "property float y", "property float z",
           "element face 0", "property list uchar int vertex_indices",
           "end_header"] + [f"{a} {b} {c}" for a, b, c in v]
    with open(path, "w") as f:
        f.write("\n".join(ply) + "\n")


def make_linemod_fixture(root: str, objects, n_frames: int = 3,
                         occlusion_objects=(), seed: int = 0) -> str:
    """Build ``<root>/LINEMOD`` + ``<root>/VOC/JPEGImages``; returns the
    LINEMOD root.  ``occlusion_objects`` additionally get
    ``test_occlusion.txt`` (benchvise frame paths — reference
    dataset_multi.py:78 label swap) and ``labels_occlusion/``."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    lm = os.path.join(root, "LINEMOD")
    bg_dir = os.path.join(root, "VOC", "JPEGImages")
    os.makedirs(bg_dir, exist_ok=True)
    Image.fromarray(rng.randint(0, 255, (480, 640, 3), np.uint8)).save(
        os.path.join(bg_dir, "bg0.jpg"), quality=90)

    for obj in objects:
        od = os.path.join(lm, obj)
        for d in ("JPEGImages", "mask", "labels"):
            os.makedirs(os.path.join(od, d), exist_ok=True)
        paths = []
        for i in range(n_frames):
            R, t = _random_pose(rng)
            pix = _project(R, t)
            img = rng.randint(0, 100, (480, 640, 3), np.uint8)
            x0 = int(np.clip(pix[:, 0].min() - 8, 0, 639))
            x1 = int(np.clip(pix[:, 0].max() + 8, 1, 640))
            y0 = int(np.clip(pix[:, 1].min() - 8, 0, 479))
            y1 = int(np.clip(pix[:, 1].max() + 8, 1, 480))
            img[y0:y1, x0:x1] = (200, 180, 160)
            m = np.zeros((480, 640), np.uint8)
            m[y0:y1, x0:x1] = 255
            name = f"00{i:04d}"          # 6-digit, leading 00 (mask rule)
            p = os.path.join(od, "JPEGImages", f"{name}.jpg")
            Image.fromarray(img).save(p, quality=92)
            Image.fromarray(m).save(os.path.join(od, "mask",
                                                 f"{name[2:]}.png"))
            np.savetxt(os.path.join(od, "labels", f"{name}.txt"),
                       _label21(pix)[None])
            paths.append(p)
        with open(os.path.join(od, "train.txt"), "w") as f:
            f.write("\n".join(paths) + "\n")
        with open(os.path.join(od, "test.txt"), "w") as f:
            f.write("\n".join(paths) + "\n")
        with open(os.path.join(od, "training_range.txt"), "w") as f:
            f.write("\n".join(str(i) for i in range(n_frames)) + "\n")
        _write_ply(os.path.join(od, f"{obj}.ply"))

    # OCCLUSION: frames live under benchvise; per-object labels_occlusion
    if occlusion_objects:
        bv = os.path.join(lm, "benchvise", "JPEGImages")
        assert os.path.isdir(bv), "benchvise must be in `objects`"
        frame_paths = sorted(
            os.path.join(bv, p) for p in os.listdir(bv))
        for obj in occlusion_objects:
            od = os.path.join(lm, obj)
            lo = os.path.join(od, "labels_occlusion")
            os.makedirs(lo, exist_ok=True)
            for p in frame_paths:
                R, t = _random_pose(rng)
                name = os.path.splitext(os.path.basename(p))[0]
                np.savetxt(os.path.join(lo, f"{name}.txt"),
                           _label21(_project(R, t))[None])
            with open(os.path.join(od, "test_occlusion.txt"), "w") as f:
                f.write("\n".join(frame_paths) + "\n")
    return lm


def write_random_weights(spec, path: str, seed: int = 0) -> None:
    """Random-init checkpoint through the bit-exact darknet codec."""
    import jax
    from singleshotpose_tpu import weights as W
    os.makedirs(os.path.dirname(path), exist_ok=True)
    params, bstats = spec.init_params(jax.random.PRNGKey(seed))
    W.save_weights(spec, params, bstats, path)
