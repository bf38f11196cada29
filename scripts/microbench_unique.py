"""Dead-end record: strided-subset estimate of the keyframe-decision
unique-hit scatter (slam/tracker.py step 6).

Full-program A/B measured 2026-08-20 (v5e, one process, a tracking
unique_stride knob since removed):

    track_compute unique_stride=1 (exact) : 16.60 ms   unique_frac 0.6156
    track_compute unique_stride=2         : 17.75 ms   unique_frac 0.7639
    track_compute unique_stride=4         : 16.82 ms   unique_frac 0.8524
    track_compute unique_stride=8         : 16.16 ms   unique_frac 0.8629
    track_compute unique_stride=1 (re)    : 16.61 ms

No time win — the strided index read costs what the smaller scatter saves —
and the subsample overestimates uniqueness badly under collisions (0.62 ->
0.85 at stride 4 on a synthetic two-view field). The knob was reverted; the
scatter below reproduces the isolated-op comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n1=3, n2=12, reps=3):
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
    H, W = 384, 512
    N = H * W
    key = jax.random.key(0)
    idx = jax.random.randint(key, (N,), 0, N, jnp.int32)
    valid = jax.random.uniform(jax.random.key(1), (N,)) < 0.8

    def unique_frac(idx, valid, s: int):
        ih = jnp.where(valid[::s], idx[::s], N)
        hit = jnp.zeros((N,), jnp.float32).at[ih].set(1.0, mode="drop")
        return jnp.sum(hit) / ih.shape[0]

    for s in (1, 2, 4, 8):
        f = jax.jit(lambda i, v: unique_frac(i, v, s))
        dt = timeit(f, idx, valid)
        print(f"unique-hit scatter stride={s}: {dt*1e3:7.3f} ms "
              f"(frac={float(f(idx, valid)):.4f})", flush=True)


if __name__ == "__main__":
    main()
