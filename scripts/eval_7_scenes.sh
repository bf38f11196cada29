#!/bin/bash
# 7-Scenes evaluation suite (reference protocol: scripts/eval_7_scenes.sh).
set -e
DATASET_ROOT=${1:?dataset root}
CHECKPOINT=${2:?checkpoint}
MODE_FLAG=${3:-}
CONFIG="eval_calib"; SAVE="7scenes_calib"
if [ "$MODE_FLAG" == "--no-calib" ]; then CONFIG="eval_no_calib"; SAVE="7scenes_no_calib"; fi
SEQS=(chess fire heads office pumpkin redkitchen stairs)
GT_DIR=${GT_DIR:-groundtruths/7-scenes}
for seq in "${SEQS[@]}"; do
    echo "=== $seq ==="
    python -m mast3r_slam_tpu.slam.run --dataset "$DATASET_ROOT/7-scenes/$seq" \
        --config $CONFIG --checkpoint "$CHECKPOINT" --save-as $SAVE --no-viz
    python -m mast3r_slam_tpu.eval.ate "logs/$SAVE/$seq.txt" "$GT_DIR/$seq.txt"
done
