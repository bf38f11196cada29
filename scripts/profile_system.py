"""Device-profile the FULL system engine (tracking + backend + retrieval).

The r3 system bench walls are implausible on the remote tunnel (tracked
frames at seconds of wall each while the hot-path bench of the same device
programs runs 32 ms): this script separates DEVICE time from host/tunnel
time by tracing a short steady-state segment of the real engine and
aggregating per-op device totals, next to the host-side stage walls.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import bench as B
    from mast3r_slam_tpu.models import mast3r as M

    print(f"devices: {jax.devices()}", flush=True)
    H, W = 384, 512
    cfg = M.VIT_LARGE
    from mast3r_slam_tpu.config import load_config
    if load_config("speed").get("engine", {}).get("head_dtype") == "bfloat16":
        import dataclasses

        cfg = dataclasses.replace(cfg, head_dtype=jnp.bfloat16)
    params = M.init_params(jax.random.key(0), cfg)

    # reuse the system bench's engine + dataset construction
    import types

    ds_frames = 26
    captured = {}

    # drive _system_bench's machinery by hand: build engine via its closure
    # (duplicating the setup keeps one source of truth in bench.py — call it
    # with a tiny frame count to get warm jits, then trace our own segment)
    from mast3r_slam_tpu.models.interface import MASt3RModel
    from mast3r_slam_tpu.retrieval.database import RetrievalDatabase
    from mast3r_slam_tpu.slam.pipeline import SLAM

    model = MASt3RModel(params, cfg, (H, W))

    def make_engine():
        c = load_config("speed")
        c["single_thread"] = True  # serialize so stage walls are honest
        c["engine"]["keyframe_buffer"] = 64
        c["engine"]["edge_buffer"] = 64
        c["matching"]["dist_thresh"] = 1e9
        c["tracking"]["Q_conf"] = -1.0
        c["tracking"]["C_conf"] = -1.0
        c["tracking"]["min_match_frac"] = -1.0
        c["local_opt"]["Q_conf"] = -1.0
        c["local_opt"]["C_conf"] = -1.0
        c["local_opt"]["min_match_frac"] = -1.0
        retrieval = RetrievalDatabase.random_init(
            jax.random.key(2), backbone_dim=cfg.enc_embed_dim
        )
        slam = SLAM(model, c, (H, W), retrieval=retrieval)
        counter = {"i": 0}
        orig_finish = slam.tracker.track_finish

        def pinned_finish(pending):
            orig_finish(pending)
            frame, kf_idx, out = pending
            if frame.X_canon is None:
                stats = np.asarray(out["stats"])
                frame.X_canon = out["frame_X"]
                frame.C = out["frame_C"]
                frame.n_fused = int(stats[4])
                frame.n_updates = int(stats[5])
                frame.score = float(stats[6])
                frame.T_WC = out["T_WCf"]
                slam.keyframes.update_pointmap(
                    kf_idx, out["kf_X"], out["kf_C"], out["kf_n_fused"],
                    out["kf_n_updates"], out["kf_score"],
                )
            counter["i"] += 1
            new_kf = counter["i"] % 6 == 0
            if new_kf:
                slam.tracker.reset_idx_f2k()
            return new_kf, False

        slam.tracker.track_finish = pinned_finish
        return slam

    rng = np.random.default_rng(0)
    base = rng.normal(size=(3, H, W)).astype(np.float32) * 0.5
    pres = [
        {"img": base + rng.normal(size=(3, H, W)).astype(np.float32) * 0.02,
         "unnormalized_img": None}
        for _ in range(4)
    ]

    def run(slam, n0, n1):
        last_T = None
        for i in range(n0, n1):
            f = slam.process_frame(i, f"{i/30.0:.6f}", last_T_WC=last_T,
                                   pre=pres[i % 4])
            last_T = f.T_WC
        np.asarray(slam.keyframes.T_WC[0])

    # warmup pass (compiles)
    t0 = time.time()
    slam = make_engine()
    run(slam, 0, ds_frames)
    slam.join_backend()
    print(f"warm pass: {time.time()-t0:.1f}s", flush=True)

    # traced steady-state pass on a FRESH engine (same shapes, warm jits)
    slam = make_engine()
    run(slam, 0, 13)  # reach steady state (2 keyframes down)
    tdir = f"/tmp/prof_system_{int(time.time())}"
    t0 = time.time()
    with jax.profiler.trace(tdir):
        run(slam, 13, 25)  # 12 frames incl. 2 keyframes + backend tasks
        slam.join_backend()
    wall = time.time() - t0
    print(f"traced 12 frames: {wall:.2f}s wall", flush=True)
    print("host stage walls:", flush=True)
    for line in slam.timer.report().splitlines():
        print("  " + line, flush=True)

    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print(f"no trace under {tdir}", flush=True)
        return
    with gzip.open(paths[0], "rt") as f:
        ev = json.load(f)["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    core_pids = {p for p, n in names.items()
                 if "TPU" in n or "TensorCore" in n or "/device:" in n}
    ops = [e for e in ev
           if e.get("ph") == "X" and e.get("pid") in core_pids
           and e.get("dur") and not e["name"].startswith("$")]
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in ops:
        agg[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
    total = sum(agg.values())
    print(f"DEVICE total over the 12 traced frames: {total/1e6:.2f} s "
          f"({total/12e3:.1f} ms/frame) vs wall {wall:.2f}s", flush=True)
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {us/1e3:9.2f} ms  x{cnt[name]:<4d} {name[:100]}", flush=True)


if __name__ == "__main__":
    main()
