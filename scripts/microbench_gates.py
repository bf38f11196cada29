"""A/B the gated-matcher knobs (proj_pre_iters, proj_init, refine budget)
inside ONE process on the real chip (session speeds vary 20-40%)."""

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


def main():
    from mast3r_slam_tpu.slam.tracker import TrackerSettings, _track_compute
    from mast3r_slam_tpu.config import load_config
    from mast3r_slam_tpu.lie import sim3

    H, W = 384, 512
    N = H * W
    key = jax.random.key(1)
    # realistic-ish two-view geometry so convergence gating has something to
    # gate: a smooth synthetic depth field viewed from two nearby poses.
    uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    z = 2.0 + 0.4 * jnp.sin(uu / 37.0) * jnp.cos(vv / 29.0)
    fx = 500.0
    X = jnp.stack([(uu - W / 2) / fx * z, (vv - H / 2) / fx * z, z], -1)[None]
    Xii = X
    Xji = X + jnp.array([0.03, 0.01, 0.02])  # small baseline
    Dii = jax.random.normal(key, (1, H, W, 24), jnp.float32)
    Dii = Dii / jnp.linalg.norm(Dii, axis=-1, keepdims=True)
    Dji = Dii
    Cii = jnp.ones((1, H, W)) * 3.0
    Qii = jnp.ones((1, H, W)) * 3.0
    kf_X = X.reshape(N, 3)
    kf_C = jnp.ones((N, 1)) * 2.0
    idx0 = jnp.arange(N, dtype=jnp.int32)
    T_id = sim3.identity()
    K = jnp.eye(3, dtype=jnp.float32)

    base = TrackerSettings.from_config(load_config("speed"))

    def track_args(ts):
        return (
            ts, (H, W), Xii, Cii, Dii, Qii, Xji, Cii, Dji, Qii,
            kf_X, kf_C.reshape(N, 1), jnp.asarray(1, jnp.int32),
            jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32),
            kf_X, kf_C, jnp.asarray(1, jnp.int32),
            jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32), T_id, T_id, idx0, K,
        )

    variants = [
        ("speed (pre=2, best, bud=.125)", base),
        ("pre_iters=1", base._replace(proj_pre_iters=1)),
        ("pre_iters=0", base._replace(proj_pre_iters=0)),
        ("pre=0 + init=pinhole", base._replace(proj_pre_iters=0, proj_init="pinhole")),
        ("pre=0 + refine_bud=.0625", base._replace(proj_pre_iters=0, refine_budget_frac=0.0625)),
        ("pre=0 + proj_bud=.0625", base._replace(proj_pre_iters=0, proj_budget_frac=0.0625)),
        ("pre=0 + both_bud=.0625", base._replace(proj_pre_iters=0, proj_budget_frac=0.0625, refine_budget_frac=0.0625)),
    ]
    fn = lambda *a: _track_compute(*a)["T_WCf"]
    for name, ts in variants:
        dt = timeit(fn, *track_args(ts))
        print(f"track_compute {name:34s}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
