#!/usr/bin/env bash
# Reproduce the reference's multi-object OCCLUSION metrics (valid_multi.py
# 5–50 px 2D-reprojection tables) with the TPU stack.
#
# Needs (reference README + multi_obj_pose_estimation/):
#   LINEMOD/                 with per-object test_occlusion.txt lists and
#                            labels_occlusion/ (the OCCLUSION annotations)
#   backup_multi/            a trained multi .weights checkpoint
#
# Usage:
#   scripts/reproduce_occlusion.sh eval            # per-object sweep
#   scripts/reproduce_occlusion.sh train           # 700-epoch training run
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-eval}"
export LINEMOD_ROOT="${LINEMOD_ROOT:-../LINEMOD}"
export BACKUP_ROOT="${BACKUP_ROOT:-backup_multi}"

mkdir -p cfg
python - <<'EOF'
import os, sys
sys.path.insert(0, os.getcwd())
from singleshotpose_tpu.zoo import OCCLUSION_OBJECTS, occlusion_datacfg
root = os.environ.get("LINEMOD_ROOT", "../LINEMOD")
backup = os.environ.get("BACKUP_ROOT", "backup_multi")
with open("cfg/occlusion.data", "w") as f:
    f.write(occlusion_datacfg(linemod_root=root, backup_root=backup))
for obj in OCCLUSION_OBJECTS:
    with open(f"cfg/{obj}_occlusion.data", "w") as f:
        f.write(occlusion_datacfg(obj, linemod_root=root, backup_root=backup))
print("rendered occlusion.data + per-object configs under cfg/")
EOF

if [ "$MODE" = "train" ]; then
    python -m singleshotpose_tpu.cli train-multi \
        --datacfg cfg/occlusion.data \
        --modelcfg yolo-pose-multi \
        --initweightfile "${BACKUP_ROOT}/init.weights" \
        --bg_dir VOCdevkit/VOC2012/JPEGImages \
        --linemod_root "${LINEMOD_ROOT}" \
        --cache_decoded
fi
python -m singleshotpose_tpu.cli valid-multi \
    --modelcfg yolo-pose-multi \
    --weightfile "${BACKUP_ROOT}/model.weights" \
    --datacfg cfg/occlusion.data
echo "Done. Compare with the reference's valid_multi.py per-object tables."
