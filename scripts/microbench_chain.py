"""In-process A/B: depth-1 vs depth-2 pipelined frontend loop (engine.chain).

Two engines with identical configs except `engine.chain`, driven through
SLAM.run on the bench's noise frames, INTERLEAVED within one process so
tunnel-session drift cancels (CLAUDE.md: never compare across processes).
Run on the real TPU: `python scripts/microbench_chain.py [n_frames rounds]`.
"""

import sys
import time

import jax
import numpy as np


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 72
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.models.interface import MASt3RModel
    from mast3r_slam_tpu.config import load_config
    from mast3r_slam_tpu.retrieval.database import RetrievalDatabase
    from mast3r_slam_tpu.slam.pipeline import SLAM

    H, W = 384, 512
    speed_cfg = load_config("speed")
    mcfg = M.VIT_LARGE
    if speed_cfg.get("engine", {}).get("head_dtype") == "bfloat16":
        import dataclasses
        import jax.numpy as jnp

        mcfg = dataclasses.replace(mcfg, head_dtype=jnp.bfloat16)
    params = M.init_params(jax.random.key(0), mcfg)
    model = MASt3RModel(params, mcfg, (H, W))

    rng = np.random.default_rng(0)
    base = rng.normal(size=(3, H, W)).astype(np.float32) * 0.5
    pres = [
        {"img": base + rng.normal(size=(3, H, W)).astype(np.float32) * 0.02,
         "unnormalized_img": None}
        for _ in range(4)
    ]

    class DS:
        timestamps = [f"{i/30.0:.6f}" for i in range(n_frames)]

        def __len__(self):
            return n_frames

        def __getitem__(self, i):
            return self.timestamps[i], None

        def preprocessed(self, i):
            return pres[i % 4]

    def make(chain: bool):
        cfg = load_config("speed")
        cfg["single_thread"] = False
        cfg["engine"]["keyframe_buffer"] = 64
        cfg["engine"]["edge_buffer"] = 64
        cfg["engine"]["chain"] = chain
        cfg["matching"]["dist_thresh"] = 1e9
        for k in ("Q_conf", "C_conf", "min_match_frac"):
            cfg["tracking"][k] = -1.0
            if k in cfg["local_opt"]:
                cfg["local_opt"][k] = -1.0
        cfg["tracking"]["min_match_frac"] = -1.0
        retrieval = RetrievalDatabase.random_init(
            jax.random.key(2), backbone_dim=mcfg.enc_embed_dim
        )
        slam = SLAM(model, cfg, (H, W), retrieval=retrieval)
        counter = {"i": 0}
        orig = slam.tracker.track_finish

        def pinned(pending):
            orig(pending)
            frame, kf_idx, out = pending
            if frame.X_canon is None:
                st = slam.tracker.last_stats
                frame.X_canon = out["frame_X"]
                frame.C = out["frame_C"]
                frame.n_fused = int(st[4])
                frame.n_updates = int(st[5])
                frame.score = float(st[6])
                frame.T_WC = out["T_WCf"]
                frame.T_WC_np = st[8:16]
                slam.keyframes.update_pointmap(
                    kf_idx, out["kf_X"], out["kf_C"], out["kf_n_fused"],
                    out["kf_n_updates"], out["kf_score"])
            counter["i"] += 1
            new_kf = counter["i"] % 6 == 0
            if new_kf:
                slam.tracker.last_match_capture = (
                    kf_idx, out["idx_f2k"], out["match_valid"], out["match_Q"])
                slam.tracker.reset_idx_f2k()
            return new_kf, False

        slam.tracker.track_finish = pinned
        return slam

    ds = DS()

    def run_once(chain):
        slam = make(chain)
        t0 = time.time()
        slam.run(ds, verbose=False)
        np.asarray(slam.keyframes.T_WC[0])
        return time.time() - t0

    # warmup both variants (compiles shared; loop shape differs)
    print(f"warmup d2 {run_once(True):.2f}s  d1 {run_once(False):.2f}s",
          file=sys.stderr)
    for r in range(rounds):
        w2 = run_once(True)
        w1 = run_once(False)
        print(f"round {r}: depth2={w2:.2f}s ({n_frames/w2:.2f} fps)  "
              f"depth1={w1:.2f}s ({n_frames/w1:.2f} fps)")


if __name__ == "__main__":
    main()
