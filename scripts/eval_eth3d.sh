#!/bin/bash
# ETH3D training-set evaluation (reference protocol: scripts/eval_eth3d.sh;
# eth3d.yaml: calib, no subsample, non-centered pp, non-strict reloc).
set -e
DATASET_ROOT=${1:?dataset root}
CHECKPOINT=${2:?checkpoint}
for seqdir in "$DATASET_ROOT"/eth3d/*/; do
    seq=$(basename "$seqdir")
    echo "=== $seq ==="
    python -m mast3r_slam_tpu.slam.run --dataset "$seqdir" \
        --config eth3d --checkpoint "$CHECKPOINT" --save-as eth3d --no-viz
    python -m mast3r_slam_tpu.eval.ate "logs/eth3d/$seq.txt" "$seqdir/groundtruth.txt"
done
