"""Scatter variants for the unique-hit statistic (tracker.py:107-110 mirror).

The scatter is row-billed like gathers (~8 ns/row floor); this checks
whether set-with-drop / int dtypes / source-stride change anything.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 384 * 512
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, N), jnp.int32)
valid = jnp.asarray(rng.random(N) < 0.9)


def timeit(fn, *args, n1=3, n2=15, reps=3):
    out = fn(*args)
    _ = np.asarray(out).ravel()[:1]

    def run(n):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(out).ravel()[:1]
        return time.time() - t0

    run(1)
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


@jax.jit
def max_f32(idx, valid):
    return jnp.zeros((N,), jnp.float32).at[idx].max(valid.astype(jnp.float32)).sum()

@jax.jit
def set_drop(idx, valid):
    im = jnp.where(valid, idx, N)
    return jnp.zeros((N,), jnp.float32).at[im].set(1.0, mode="drop").sum()

@jax.jit
def set_drop_i8(idx, valid):
    im = jnp.where(valid, idx, N)
    return jnp.zeros((N,), jnp.int8).at[im].set(1, mode="drop").astype(jnp.int32).sum()

@jax.jit
def add_f32(idx, valid):
    h = jnp.zeros((N,), jnp.float32).at[idx].add(valid.astype(jnp.float32))
    return (h > 0).sum()

@jax.jit
def stride2(idx, valid):
    im = jnp.where(valid[::2], idx[::2], N)
    return jnp.zeros((N,), jnp.float32).at[im].set(1.0, mode="drop").sum()

for name, fn in (("max f32", max_f32), ("set drop f32", set_drop),
                 ("set drop i8", set_drop_i8), ("add f32", add_f32),
                 ("set drop f32 src/2", stride2)):
    print(f"{name:20s}: {timeit(fn, idx, valid)*1e3:7.2f} ms", flush=True)
