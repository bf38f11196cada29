"""Convert reference PyTorch checkpoints to cached npz param pytrees.

    python tools/convert_checkpoint.py MASt3R_ViTLarge....pth mast3r_vitl.npz

The npz loads ~30x faster than re-running the torch load + layout transposes
(pass it to `--checkpoint` of the SLAM CLI; .npz is auto-detected).
"""

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("torch_checkpoint")
    p.add_argument("out_npz")
    args = p.parse_args(argv)

    sys.path.insert(0, ".")
    from mast3r_slam_tpu.models.convert import load_torch_checkpoint
    from mast3r_slam_tpu.models.io import save_params

    t0 = time.time()
    params, cfg = load_torch_checkpoint(args.torch_checkpoint)
    print(f"converted in {time.time() - t0:.1f}s")
    save_params(args.out_npz, params)
    print(f"wrote {args.out_npz}")


if __name__ == "__main__":
    main()
