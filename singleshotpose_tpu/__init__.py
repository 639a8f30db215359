"""singleshotpose_tpu — TPU-native single-shot 6D object pose estimation.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
microsoft/singleshotpose (Tekin, Sinha & Fua, CVPR 2018): a YOLOv2-style
Darknet-19 network regressing 2D projections of an object's 3D bounding-box
keypoints from a single RGB image, with on-device batched PnP pose recovery,
LINEMOD (single-object) and OCCLUSION (multi-object) training/eval, bit-exact
darknet ``.weights`` IO, and data-parallel scale-out over a TPU mesh.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
