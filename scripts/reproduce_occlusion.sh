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
#
# Environment overrides (all optional):
#   LINEMOD_ROOT BACKUP_ROOT   data/checkpoint roots
#   CFG_DIR                    where rendered .data configs go (default cfg/)
#   BG_DIR                     train-mode VOC background dir
#   TRAIN_EXTRA_FLAGS VALID_EXTRA_FLAGS   appended verbatim to the CLI calls
#                              (tests/test_reproduce_scripts.py rehearses this
#                              script end-to-end on a synthetic fixture)
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-eval}"
export LINEMOD_ROOT="${LINEMOD_ROOT:-../LINEMOD}"
export BACKUP_ROOT="${BACKUP_ROOT:-backup_multi}"
export CFG_DIR="${CFG_DIR:-cfg}"
BG_DIR="${BG_DIR:-VOCdevkit/VOC2012/JPEGImages}"

mkdir -p "$CFG_DIR"
python - <<'EOF'
import os, sys
sys.path.insert(0, os.getcwd())
from singleshotpose_tpu.zoo import OCCLUSION_OBJECTS, occlusion_datacfg
root = os.environ.get("LINEMOD_ROOT", "../LINEMOD")
backup = os.environ.get("BACKUP_ROOT", "backup_multi")
cfg_dir = os.environ.get("CFG_DIR", "cfg")
with open(f"{cfg_dir}/occlusion.data", "w") as f:
    f.write(occlusion_datacfg(linemod_root=root, backup_root=backup,
                              train_list=f"{cfg_dir}/train_occlusion.txt"))
for obj in OCCLUSION_OBJECTS:
    with open(f"{cfg_dir}/{obj}_occlusion.data", "w") as f:
        f.write(occlusion_datacfg(obj, linemod_root=root, backup_root=backup))
print(f"rendered occlusion.data + per-object configs under {cfg_dir}/")
EOF

if [ "$MODE" = "train" ]; then
    python -m singleshotpose_tpu.cli train-multi \
        --datacfg "${CFG_DIR}/occlusion.data" \
        --modelcfg yolo-pose-multi \
        --initweightfile "${BACKUP_ROOT}/init.weights" \
        --bg_dir "$BG_DIR" \
        --linemod_root "${LINEMOD_ROOT}" \
        --cache_decoded \
        ${TRAIN_EXTRA_FLAGS:-}
fi
python -m singleshotpose_tpu.cli valid-multi \
    --modelcfg yolo-pose-multi \
    --weightfile "${BACKUP_ROOT}/model.weights" \
    --datacfg "${CFG_DIR}/occlusion.data" \
    ${VALID_EXTRA_FLAGS:-}
echo "Done. Compare with the reference's valid_multi.py per-object tables."
