"""Per-stage timing of the tracked-frame hot path on the real chip.

Mirrors bench.py's frame setup but times each stage as its own jitted
program (encoder / decoder+heads / matching exact & speed / GN solve /
fusion) plus the fused full-frame step in both profiles.  Differential
timing cancels tunnel dispatch overhead.

Usage: python scripts/bench_stages.py [stage ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n1=3, n2=9, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    def run(n):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.time() - t0

    run(1)
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def main(stages):
    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.slam.tracker import TrackerSettings, _track_compute
    from mast3r_slam_tpu.config import load_config
    from mast3r_slam_tpu.lie import sim3

    H, W = 384, 512
    N = H * W
    cfg = M.VIT_LARGE
    grid = cfg.grid((H, W))

    params = M.init_params(jax.random.key(0), cfg)

    key = jax.random.key(1)
    img = jax.random.normal(key, (1, 3, H, W), jnp.float32) * 0.5
    kf_feat = jax.random.normal(key, (1, grid[0] * grid[1], cfg.enc_embed_dim))
    kf_pos = M.patch_positions(1, grid)
    kf_X = jnp.abs(jax.random.normal(key, (N, 3))) + 0.5
    kf_C = jnp.ones((N, 1)) * 2.0
    idx0 = jnp.arange(N, dtype=jnp.int32)
    T_id = sim3.identity()
    K = jnp.eye(3, dtype=jnp.float32)

    enc = jax.jit(lambda p, im: M.encode_image(p, cfg, im))
    feat, pos = enc(params, img)
    feat = jax.block_until_ready(feat)

    if not stages or "encoder" in stages:
        print(f"encoder:            {timeit(enc, params, img)*1e3:8.2f} ms", flush=True)

    dec = jax.jit(lambda p, f, po, kf, kp: M.inference_asymmetric(p, cfg, f, po, kf, kp, grid))
    outs = dec(params, feat, pos, kf_feat, kf_pos)
    (Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji) = jax.block_until_ready(outs)

    if not stages or "decoder" in stages:
        print(f"decoder+heads:      {timeit(dec, params, feat, pos, kf_feat, kf_pos)*1e3:8.2f} ms", flush=True)

    def track_args(ts):
        return (
            ts, (H, W), Xii, Cii, Dii, Qii, Xji, Cji, Dji, Qji,
            Xii.reshape(N, 3), Cii.reshape(N, 1), jnp.asarray(1, jnp.int32),
            jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32),
            kf_X, kf_C, jnp.asarray(1, jnp.int32),
            jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32), T_id, T_id, idx0, K,
        )

    ts_exact = TrackerSettings.from_config(load_config("base"))
    ts_speed = TrackerSettings.from_config(load_config("speed"))

    if not stages or "track" in stages:
        for name, ts in (("exact", ts_exact), ("speed", ts_speed)):
            fn = lambda *a: _track_compute(*a)["T_WCf"]
            print(f"track_compute {name}: {timeit(fn, *track_args(ts))*1e3:8.2f} ms", flush=True)

    if not stages or "frame" in stages:
        for name, ts in (("exact", ts_exact), ("speed", ts_speed)):
            @jax.jit
            def frame_step(params, img, kf_feat, kf_pos, kf_X, kf_C, T_WCf, T_WCk, idx_init, ts=ts):
                feat, pos = M.encode_image(params, cfg, img)
                (Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji) = M.inference_asymmetric(
                    params, cfg, feat, pos, kf_feat, kf_pos, grid
                )
                out = _track_compute(
                    ts, (H, W), Xii, Cii, Dii, Qii, Xji, Cji, Dji, Qji,
                    Xii.reshape(N, 3), Cii.reshape(N, 1), jnp.asarray(1, jnp.int32),
                    jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32),
                    kf_X, kf_C, jnp.asarray(1, jnp.int32),
                    jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32),
                    T_WCf, T_WCk, idx_init, K,
                )
                return out["T_WCf"], out["stats"], out["idx_f2k"]

            dt = timeit(frame_step, params, img, kf_feat, kf_pos, kf_X, kf_C, T_id, T_id, idx0)
            print(f"full frame {name}:  {dt*1e3:8.2f} ms ({1.0/dt:.2f} fps)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
