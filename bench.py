"""Benchmark: SLAM tracked-frame throughput on one chip.

Times the full per-frame hot path of the engine at production resolution
(384x512, ViT-L random weights — FLOPs identical to pretrained):
encoder -> asymmetric two-view decode + heads -> dense projective matching ->
Sim(3) GN pose solve -> pointmap fusion.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference paper's real-time claim of ~15 fps on an RTX 4090
(README.md:142-144; SURVEY.md §6).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_FPS = 15.0


def _watchdog(seconds: float):
    """Remote-TPU relays can wedge (dead chip claim); never hang the driver —
    abort with a clear error instead of printing nothing forever."""
    import os
    import threading

    def boom():
        print(
            f"bench watchdog: no progress in {seconds:.0f}s — device "
            "unreachable/wedged; aborting without a result",
            file=sys.stderr,
        )
        os._exit(2)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    return t


def main():
    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.slam.tracker import TrackerSettings, _track_compute
    from mast3r_slam_tpu.config import load_config
    from mast3r_slam_tpu.lie import sim3

    H, W = 384, 512
    N = H * W
    cfg = M.VIT_LARGE
    grid = cfg.grid((H, W))

    # liveness probe under a watchdog, then a generous compile window.
    # The remote compile service has been observed to degrade to ~3-4 min
    # for a TRIVIAL program (2026-08-19); both limits are sized for that
    # state — the probe only has to distinguish "slow" from "wedged".
    probe_guard = _watchdog(900)
    import numpy as _np

    _ = _np.asarray((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0])
    probe_guard.cancel()
    _watchdog(3600)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    params = M.init_params(jax.random.key(0), cfg)
    # production speed profile (configs/speed.yaml): gated matcher paths,
    # trajectory-equivalence asserted by tests/test_slam_e2e.py
    ts = TrackerSettings.from_config(load_config("speed"))

    key = jax.random.key(1)
    img = jax.random.normal(key, (1, 3, H, W), jnp.float32) * 0.5
    kf_feat = jax.random.normal(key, (1, grid[0] * grid[1], cfg.enc_embed_dim))
    kf_pos = M.patch_positions(1, grid)
    kf_X = jnp.abs(jax.random.normal(key, (N, 3))) + 0.5
    kf_C = jnp.ones((N, 1)) * 2.0
    idx0 = jnp.arange(N, dtype=jnp.int32)
    T_id = sim3.identity()
    K = jnp.eye(3, dtype=jnp.float32)

    # three device programs per frame, exactly the engine's structure
    # (slam/tracker.py: model.encode -> model.asymmetric -> _track_compute).
    # One mega-jit measures ~19 ms SLOWER than the same ops as separate
    # programs (XLA scheduling regression when model + matcher fuse) and is
    # not what the engine executes.
    enc = jax.jit(lambda p, im: M.encode_image(p, cfg, im))

    def frame_step(params, img, kf_feat, kf_pos, kf_X, kf_C, T_WCf, T_WCk, idx_init):
        feat, pos = enc(params, img)
        (Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji) = M.inference_asymmetric(
            params, cfg, feat, pos, kf_feat, kf_pos, grid
        )
        out = _track_compute(
            ts, (H, W),
            Xii, Cii, Dii, Qii, Xji, Cji, Dji, Qji,
            Xii.reshape(N, 3), Cii.reshape(N, 1), jnp.asarray(1, jnp.int32),
            jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32),
            kf_X, kf_C, jnp.asarray(1, jnp.int32),
            jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32),
            T_WCf, T_WCk, idx_init, K,
        )
        return out["T_WCf"], out["stats"], out["idx_f2k"]

    args = (params, img, kf_feat, kf_pos, kf_X, kf_C, T_id, T_id, idx0)

    import numpy as np

    def run_n(n):
        """n sequential steps + host readback (block_until_ready does not
        actually block over remote-TPU relays, so force a readback)."""
        t0 = time.time()
        for _ in range(n):
            out = frame_step(*args)
        _ = np.asarray(out[0])  # tiny (8,) readback forces completion
        return time.time() - t0

    t0 = time.time()
    run_n(1)
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    run_n(2)  # warmup

    # differential timing cancels the fixed tunnel/dispatch overhead
    n1, n2 = 5, 15
    t1 = min(run_n(n1) for _ in range(3))
    t2 = min(run_n(n2) for _ in range(3))
    dt = (t2 - t1) / (n2 - n1)
    fps = 1.0 / dt
    print(f"per-frame: {dt*1000:.2f} ms", file=sys.stderr)

    print(json.dumps({
        "metric": "slam_tracked_frame_fps_1chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
