"""Device-profile the per-frame hot programs (dec+heads, track_compute) and
print the top TPU ops by total device time.

jax.profiler.trace works over the axon tunnel; the event stream lands in
<dir>/plugins/profile/*/<f>.trace.json.gz. We aggregate 'X' (complete) events
on TensorCore tracks by op name over the LAST repetition only (steady
state), so per-op times are per-execution.
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


def trace_and_report(tag, fn, *args, reps=3, top=25):
    out = fn(*args)  # compile
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    tdir = f"/tmp/prof_{tag}_{int(time.time())}"
    with jax.profiler.trace(tdir):
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print(f"[{tag}] no trace written under {tdir}", flush=True)
        return
    with gzip.open(paths[0], "rt") as f:
        ev = json.load(f)["traceEvents"]

    # TensorCore op tracks: pick pids whose process_name mentions TPU/TensorCore
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    core_pids = {p for p, n in names.items()
                 if "TPU" in n or "TensorCore" in n or "/device:" in n}

    ops = [e for e in ev
           if e.get("ph") == "X" and e.get("pid") in core_pids
           and e.get("dur") and not e["name"].startswith("$")]
    if not ops:
        print(f"[{tag}] no device ops found (pids seen: {names})", flush=True)
        return

    # steady state: keep only events in the last third of the span
    t_end = max(e["ts"] + e["dur"] for e in ops)
    t_start = min(e["ts"] for e in ops)
    cut = t_end - (t_end - t_start) / reps
    last = [e for e in ops if e["ts"] >= cut]

    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in last:
        agg[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
    total = sum(agg.values())
    print(f"\n[{tag}] device total (last rep): {total/1e3:.2f} ms, "
          f"{len(last)} events", flush=True)
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us/1e3:7.3f} ms  x{cnt[name]:<4d} {name[:110]}", flush=True)


def main():
    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.slam.tracker import TrackerSettings, _track_compute
    from mast3r_slam_tpu.config import load_config
    from mast3r_slam_tpu.lie import sim3

    H, W = 384, 512
    N = H * W
    cfg = M.VIT_LARGE
    # mirror bench.py: the speed profile's head compute dtype
    if load_config("speed").get("engine", {}).get("head_dtype") == "bfloat16":
        import dataclasses

        cfg = dataclasses.replace(cfg, head_dtype=jnp.bfloat16)
    grid = cfg.grid((H, W))
    params = M.init_params(jax.random.key(0), cfg)
    key = jax.random.key(1)
    feat = jax.random.normal(key, (1, N // 256, cfg.enc_embed_dim))
    pos = M.patch_positions(1, grid)
    kf_feat = jax.random.normal(jax.random.key(2), (1, N // 256, cfg.enc_embed_dim))

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "enc"):
        img = jax.random.normal(key, (1, 3, H, W), jnp.float32) * 0.5
        enc = jax.jit(lambda p, im: M.encode_image(p, cfg, im))
        trace_and_report("enc", enc, params, img)

    if which in ("all", "dec"):
        dec = jax.jit(lambda p: M._decode_and_heads(p, cfg, feat, pos, kf_feat, pos, grid))
        trace_and_report("dec_heads", dec, params)

    if which in ("all", "track"):
        uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                              jnp.arange(H, dtype=jnp.float32))
        z = 2.0 + 0.4 * jnp.sin(uu / 37.0) * jnp.cos(vv / 29.0)
        X = jnp.stack([(uu - W / 2) / 500.0 * z, (vv - H / 2) / 500.0 * z, z], -1)[None]
        Dii = jax.random.normal(key, (1, H, W, 24), jnp.float32)
        Dii = Dii / jnp.linalg.norm(Dii, axis=-1, keepdims=True)
        Cmap = jnp.ones((1, H, W)) * 3.0
        ts = TrackerSettings.from_config(load_config("speed"))
        idx0 = jnp.arange(N, dtype=jnp.int32)
        args = (ts, (H, W), X, Cmap, Dii, Cmap,
                X + jnp.array([0.03, 0.01, 0.02]), Cmap, Dii, Cmap,
                X.reshape(N, 3), jnp.ones((N, 1)) * 2.0, jnp.asarray(1, jnp.int32),
                jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32),
                X.reshape(N, 3), jnp.ones((N, 1)) * 2.0, jnp.asarray(1, jnp.int32),
                jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32),
                sim3.identity(), sim3.identity(), idx0,
                jnp.eye(3, dtype=jnp.float32))
        trace_and_report("track", lambda *a: _track_compute(*a), *args)


if __name__ == "__main__":
    main()
