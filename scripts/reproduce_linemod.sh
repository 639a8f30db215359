#!/usr/bin/env bash
# Reproduce the reference's LINEMOD acceptance metrics with the TPU stack.
#
# One command once the external data exists (the reference's own downloads,
# README.md:34-48 of microsoft/singleshotpose):
#
#   LINEMOD/            the 13-object dataset (train.txt/test.txt/<obj>.ply)
#   VOCdevkit/          VOC2012 JPEGImages (train-time backgrounds)
#   backup/             the reference's trained per-object .weights
#                       (or cfg/darknet19_448.conv.23 to train from scratch)
#
# Usage:
#   scripts/reproduce_linemod.sh eval  [objects...]   # eval reference weights
#   scripts/reproduce_linemod.sh train [objects...]   # full training runs
#
# Environment overrides (all optional; defaults = the reference layout):
#   LINEMOD_ROOT BACKUP_ROOT   data/checkpoint roots
#   CFG_DIR                    where the rendered .data configs go (default cfg/)
#   INIT_WEIGHTS BG_DIR        train-mode backbone + VOC background dir
#   TRAIN_EXTRA_FLAGS VALID_EXTRA_FLAGS   appended verbatim to the CLI calls
#                              (tests/test_reproduce_scripts.py rehearses this
#                              script end-to-end on a synthetic fixture with
#                              TRAIN_EXTRA_FLAGS="--max_epochs 1")
#
# Eval loads the reference's own checkpoints through the bit-exact weights
# codec (tests/test_weights_cross_ab.py), so matching numbers here are a
# direct accuracy-parity proof against /root/reference's valid.py tables.
#
# Symmetric objects (eggbox, glue): the reference scores them with plain
# ADD (its adi is never called), which this script reproduces.  For the
# ADD-S protocol used by most published tables, re-run those two with
# VALID_EXTRA_FLAGS="--add_s".
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-eval}"
shift || true
OBJECTS=("$@")
if [ ${#OBJECTS[@]} -eq 0 ]; then
    OBJECTS=(ape benchvise cam can cat driller duck eggbox glue holepuncher iron lamp phone)
fi

export LINEMOD_ROOT="${LINEMOD_ROOT:-LINEMOD}"
export BACKUP_ROOT="${BACKUP_ROOT:-backup}"
export CFG_DIR="${CFG_DIR:-cfg}"
INIT_WEIGHTS="${INIT_WEIGHTS:-cfg/darknet19_448.conv.23}"
BG_DIR="${BG_DIR:-VOCdevkit/VOC2012/JPEGImages}"

mkdir -p "$CFG_DIR"
python - "$@" <<'EOF'
import os, sys
sys.path.insert(0, os.getcwd())
from singleshotpose_tpu.zoo import linemod_datacfg, LINEMOD_OBJECTS
root = os.environ.get("LINEMOD_ROOT", "LINEMOD")
backup = os.environ.get("BACKUP_ROOT", "backup")
cfg_dir = os.environ.get("CFG_DIR", "cfg")
objs = sys.argv[1:] or list(LINEMOD_OBJECTS)
for obj in objs:
    with open(f"{cfg_dir}/{obj}.data", "w") as f:
        f.write(linemod_datacfg(obj, root, backup))
print(f"rendered {len(objs)} .data configs under {cfg_dir}/")
EOF

for obj in "${OBJECTS[@]}"; do
    echo "=== ${obj} (${MODE}) ==="
    if [ "$MODE" = "train" ]; then
        python -m singleshotpose_tpu.cli train \
            --datacfg "${CFG_DIR}/${obj}.data" \
            --modelcfg yolo-pose \
            --initweightfile "$INIT_WEIGHTS" \
            --pretrain_num_epochs 15 \
            --bg_dir "$BG_DIR" \
            ${TRAIN_BASE_FLAGS:---cache_decoded --precompile_buckets} \
            ${TRAIN_EXTRA_FLAGS:-}
        WEIGHTS="${BACKUP_ROOT}/${obj}/model.weights"
    else
        WEIGHTS="${BACKUP_ROOT}/${obj}/model_backup.weights"
        [ -f "$WEIGHTS" ] || WEIGHTS="${BACKUP_ROOT}/${obj}/model.weights"
    fi
    python -m singleshotpose_tpu.cli valid \
        --datacfg "${CFG_DIR}/${obj}.data" \
        --modelcfg yolo-pose \
        --weightfile "$WEIGHTS" \
        ${VALID_EXTRA_FLAGS:-}
done
echo "Done. Compare the per-object tables with the reference's valid.py output."
