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
    speed_cfg = load_config("speed")
    cfg = M.VIT_LARGE
    if speed_cfg.get("engine", {}).get("head_dtype") == "bfloat16":
        import dataclasses

        cfg = dataclasses.replace(cfg, head_dtype=jnp.bfloat16)
    grid = cfg.grid((H, W))

    # liveness probe under a watchdog, then a generous compile window.
    # The remote compile service has been observed to degrade to ~15 min
    # for a TRIVIAL program (2026-08-20; ~3-4 min on 2026-08-19) — both
    # limits are sized for that state, with margin: the probe only has to
    # distinguish "slow" from "wedged", and aborting a merely-slow session
    # would record no benchmark at all.
    probe_guard = _watchdog(2400)
    import numpy as _np

    _ = _np.asarray((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0])
    probe_guard.cancel()
    _watchdog(3600)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    params = M.init_params(jax.random.key(0), cfg)
    # production speed profile (configs/speed.yaml): gated matcher paths +
    # bf16 heads, trajectory-equivalence asserted by tests/test_slam_e2e.py
    ts = TrackerSettings.from_config(speed_cfg)

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

    _report_stages_and_mfu(
        dt, enc, params, img, cfg, grid, ts, (H, W), N,
        kf_feat, kf_pos, kf_X, kf_C, T_id, idx0, K, frame_step, args,
    )

    print(json.dumps({
        "metric": "slam_tracked_frame_fps_1chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


# chip -> dense bf16 peak FLOP/s (per chip); MFU is judged against the MXU's
# speed-of-light so the number is comparable across submissions
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _report_stages_and_mfu(dt_frame, enc, params, img, cfg, grid, ts, hw, N,
                           kf_feat, kf_pos, kf_X, kf_C, T_id, idx0, K,
                           frame_step, args):
    """Per-stage wall ms + model-FLOPs MFU on stderr (judging aid only)."""
    import numpy as np
    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.slam.tracker import _track_compute

    H, W = hw
    feat, pos = enc(params, img)
    (Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji) = M.inference_asymmetric(
        params, cfg, feat, pos, kf_feat, kf_pos, grid
    )
    one_i32 = jnp.asarray(1, jnp.int32)
    ninf = jnp.asarray(-jnp.inf, jnp.float32)
    track_args = (
        ts, hw, Xii, Cii, Dii, Qii, Xji, Cji, Dji, Qji,
        Xii.reshape(N, 3), Cii.reshape(N, 1), one_i32, one_i32, ninf,
        kf_X, kf_C, one_i32, one_i32, ninf, T_id, T_id, idx0, K,
    )

    stages = {
        "encode": lambda: enc(params, img)[0],
        "decode+heads": lambda: M.inference_asymmetric(
            params, cfg, feat, pos, kf_feat, kf_pos, grid
        )[0][0],
        "track_compute": lambda: _track_compute(*track_args)["T_WCf"],
    }

    def time_stage(fn, n1=5, n2=15, reps=2):
        def run(n):
            t0 = time.time()
            for _ in range(n):
                out = fn()
            _ = np.asarray(out).ravel()[:1]
            return time.time() - t0

        run(2)
        t1 = min(run(n1) for _ in range(reps))
        t2 = min(run(n2) for _ in range(reps))
        return (t2 - t1) / (n2 - n1)

    stage_ms = {}
    for name, fn in stages.items():
        stage_ms[name] = time_stage(fn) * 1e3
    total = sum(stage_ms.values())
    parts = "  ".join(f"{k}={v:.2f}ms" for k, v in stage_ms.items())
    print(f"stages: {parts}  sum={total:.2f}ms", file=sys.stderr)

    # model FLOPs from XLA cost analysis of the three real programs
    try:
        flops = 0.0
        for lowered in (
            jax.jit(lambda p, im: M.encode_image(p, cfg, im)).lower(params, img),
            M.inference_asymmetric.lower(
                params, cfg, feat, pos, kf_feat, kf_pos, grid
            ),
            _track_compute.lower(*track_args),
        ):
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops += float(ca.get("flops", 0.0))
        kind = jax.devices()[0].device_kind
        peak = next(
            (v for k, v in _PEAK_FLOPS.items() if k.lower() in kind.lower()),
            None,
        )
        msg = f"model_flops/frame: {flops/1e9:.1f} GF  "
        msg += f"achieved: {flops/dt_frame/1e12:.1f} TF/s"
        if peak:
            msg += f"  MFU: {100.0*flops/dt_frame/peak:.1f}% of {kind}"
        else:
            msg += f"  (no peak table entry for {kind!r})"
        print(msg, file=sys.stderr)
    except Exception as e:  # pragma: no cover - accounting must never kill bench
        print(f"mfu accounting unavailable: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
