#!/bin/bash
# TUM fr1 evaluation suite (reference protocol: scripts/eval_tum.sh).
# Usage: scripts/eval_tum.sh <dataset_root> <checkpoint> [--no-calib]
set -e

DATASET_ROOT=${1:?dataset root (contains tum/ sequences)}
CHECKPOINT=${2:?MASt3R checkpoint path}
MODE_FLAG=${3:-}

CONFIG="eval_calib"
SAVE="tum_calib"
if [ "$MODE_FLAG" == "--no-calib" ]; then
    CONFIG="eval_no_calib"
    SAVE="tum_no_calib"
fi

SEQS=(
  rgbd_dataset_freiburg1_360
  rgbd_dataset_freiburg1_desk
  rgbd_dataset_freiburg1_desk2
  rgbd_dataset_freiburg1_floor
  rgbd_dataset_freiburg1_plant
  rgbd_dataset_freiburg1_room
  rgbd_dataset_freiburg1_rpy
  rgbd_dataset_freiburg1_teddy
  rgbd_dataset_freiburg1_xyz
)

for seq in "${SEQS[@]}"; do
    echo "=== $seq ==="
    python -m mast3r_slam_tpu.slam.run \
        --dataset "$DATASET_ROOT/tum/$seq" \
        --config $CONFIG \
        --checkpoint "$CHECKPOINT" \
        --save-as $SAVE --no-viz
    python -m mast3r_slam_tpu.eval.ate \
        "logs/$SAVE/$seq.txt" "$DATASET_ROOT/tum/$seq/groundtruth.txt"
done
