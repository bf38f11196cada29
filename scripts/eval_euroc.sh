#!/bin/bash
# EuRoC evaluation suite (reference protocol: scripts/eval_euroc.sh).
# Usage: scripts/eval_euroc.sh <dataset_root> <checkpoint> [--no-calib]
set -e
DATASET_ROOT=${1:?dataset root}
CHECKPOINT=${2:?checkpoint}
MODE_FLAG=${3:-}
CONFIG="eval_calib"; SAVE="euroc_calib"
if [ "$MODE_FLAG" == "--no-calib" ]; then CONFIG="eval_no_calib"; SAVE="euroc_no_calib"; fi
SEQS=(MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult
      V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium V2_03_difficult)
GT_DIR=${GT_DIR:-groundtruths/euroc}
for seq in "${SEQS[@]}"; do
    echo "=== $seq ==="
    python -m mast3r_slam_tpu.slam.run --dataset "$DATASET_ROOT/euroc/$seq" \
        --config $CONFIG --checkpoint "$CHECKPOINT" --save-as $SAVE --no-viz
    python -m mast3r_slam_tpu.eval.ate "logs/$SAVE/$seq.txt" "$GT_DIR/$seq.txt"
done
